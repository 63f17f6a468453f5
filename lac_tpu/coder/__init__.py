from .reference import ArithmeticDecoder, ArithmeticEncoder, ac_decode, ac_encode  # noqa: F401
from .streaming import StreamingDecoder, StreamingEncoder  # noqa: F401
