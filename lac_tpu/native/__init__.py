from .host import (  # noqa: F401
    native_available,
    native_compress,
    native_decompress,
)
