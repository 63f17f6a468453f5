from .engine import compress_bytes, decompress_bytes  # noqa: F401
