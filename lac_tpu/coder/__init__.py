from .reference import ArithmeticDecoder, ArithmeticEncoder, ac_decode, ac_encode  # noqa: F401
