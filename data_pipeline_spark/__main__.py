"""`python -m data_pipeline_spark` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
