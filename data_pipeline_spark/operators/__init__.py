"""Reusable scale-path operators beyond the declared-query surface:
approximate nearest neighbors (similarity.py), multimodal column plumbing
(multimodal.py). Each is a library API over DataFrames, exercised by
tests/ and surfaced through queries/ where an oracle exists.
"""
