"""``python -m iterseg_tpu`` → the CLI (see ``cli.py``)."""
import sys

from .cli import main

sys.exit(main())
