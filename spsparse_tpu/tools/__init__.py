"""Command-line tools: ``python -m spsparse_tpu.tools <cmd> ...``."""
