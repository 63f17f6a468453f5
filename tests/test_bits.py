import random

from lac_tpu.utils.bits import BitReader, BitWriter, pack_bits, unpack_bits


def test_writer_reader_roundtrip():
    rng = random.Random(0)
    for _ in range(50):
        bits = [rng.randint(0, 1) for _ in range(rng.randint(0, 70))]
        w = BitWriter()
        for b in bits:
            w.write(b)
        data = w.getvalue()
        assert len(data) == (len(bits) + 7) // 8
        r = BitReader(data, nbits=len(bits))
        assert [r.read() for _ in range(len(bits))] == bits
        # reads past the end return the pad bit and count overrun
        assert r.read() == 0
        assert r.overrun == 1


def test_pack_unpack():
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1]
    data = pack_bits(bits)
    assert list(unpack_bits(data, len(bits))) == bits


def test_write_read_int():
    w = BitWriter()
    w.write_int(0xDEADBEEF, 32)
    w.write_int(5, 3)
    r = BitReader(w.getvalue(), nbits=35)
    assert r.read_int(32) == 0xDEADBEEF
    assert r.read_int(3) == 5
