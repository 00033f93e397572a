from . import schedule, tokenize  # noqa: F401
