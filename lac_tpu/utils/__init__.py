from .bits import BitReader, BitWriter, pack_bits, unpack_bits  # noqa: F401
from .baseconv import bytes_to_digits, digits_to_bytes  # noqa: F401
