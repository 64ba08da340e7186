from . import decode, hexutils  # noqa: F401
