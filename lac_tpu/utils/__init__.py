from .bits import BitReader, BitWriter, pack_bits, unpack_bits  # noqa: F401
