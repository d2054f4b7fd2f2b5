"""String / URI / identifier scalar functions (SURVEY §2.8 F8–F13, F25).

All pure Column expressions — they stay inside whole-stage codegen, so at
100TB these are free riders on the scan. Reference semantics:
clean_names `process/base/reconciler.py:58-59`, normalize_url
`sources/lux/final/mapper.py:713-718`, identifier fix
`pipeline/config.py:171-186`, canonicalize `config.py:230-245`,
qua algebra `config.py:130-145` (all file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# zero-width + bidi control characters stripped from reconcile join keys
_CTRL_CLASS = r"[\x{200B}-\x{200F}\x{202A}-\x{202E}\x{FEFF}]"


def clean_name(col: Column) -> Column:
    """F8: strip zero-width/bidi controls, collapse whitespace, lower, trim
    — the canonical reconcile name key."""
    no_ctrl = F.regexp_replace(col, _CTRL_CLASS, "")
    one_space = F.regexp_replace(no_ctrl, r"\s+", " ")
    return F.lower(F.trim(one_space))


def normalize_url(col: Column) -> Column:
    """F10: default scheme to https, strip `www.`, strip trailing `/` —
    the webpage-dedupe key (A10)."""
    with_scheme = F.when(col.rlike(r"^https?://"), col).otherwise(F.concat(F.lit("https://"), col))
    https = F.regexp_replace(with_scheme, r"^http://", "https://")
    no_www = F.regexp_replace(https, r"^https://www\.", "https://")
    return F.regexp_replace(no_www, r"/$", "")


def fix_identifier(col: Column) -> Column:
    """F12: strip spaces/quotes, trailing `/` and `.html` from source
    identifiers before caching/joining."""
    no_junk = F.regexp_replace(col, r"""[\s'"]+""", "")
    no_ext = F.regexp_replace(no_junk, r"\.html$", "")
    return F.regexp_replace(no_ext, r"/$", "")


def canonicalize_uri(col: Column, rewrites: dict[str, str] | None = None) -> Column:
    """F13: apply a rewrite table (old-prefix -> new-prefix), longest match
    first, then identifier cleanup. ``rewrites`` is a plain dict baked into
    the plan as a literal when-chain (bounded, config-driven)."""
    out = fix_identifier(col)
    for old, new in sorted((rewrites or {}).items(), key=lambda kv: -len(kv[0])):
        out = F.when(out.startswith(old), F.concat(F.lit(new), F.substring(out, len(old) + 1, 10_000_000))).otherwise(out)
    return out


def make_qua(uri: Column, rectype: Column) -> Column:
    """F25: the `uri##quaType` suffix algebra. The engine keeps (uri,
    rectype) as two columns (SURVEY §1.5) — this is the boundary codec for
    interop with reference-shaped data."""
    return F.concat(uri, F.lit("##qua"), rectype)


def split_qua(qua: Column) -> tuple[Column, Column]:
    """Inverse of make_qua: returns (uri, rectype) columns."""
    uri = F.regexp_extract(qua, r"^(.*?)##qua", 1)
    uri = F.when(qua.contains("##qua"), uri).otherwise(qua)
    rectype = F.regexp_extract(qua, r"##qua(.*)$", 1)
    rectype = F.when(qua.contains("##qua"), rectype).otherwise(F.lit(None).cast("string"))
    return uri, rectype


def strip_html(col: Column) -> Column:
    """F14 (subset): remove tags and unescape the common entities — the
    declarative fast path of the reference's BeautifulSoup strip
    (marklogic/mapper.py:138-148); full entity fidelity would be a UDF."""
    no_tags = F.regexp_replace(col, r"<[^>]*>", " ")
    amp = F.regexp_replace(no_tags, r"&amp;", "&")
    lt = F.regexp_replace(amp, r"&lt;", "<")
    gt = F.regexp_replace(lt, r"&gt;", ">")
    nbsp = F.regexp_replace(gt, r"&nbsp;", " ")
    return F.trim(F.regexp_replace(nbsp, r"\s+", " "))
