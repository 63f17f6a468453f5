"""Config layer wiring: CLI flags must actually change engine behavior and
the dataclasses must round-trip from container config dicts (VERDICT round-1
item 6 — the reference's only config surface is scattered keyword defaults,
SURVEY.md §5 config row)."""

import numpy as np

from lac_tpu.cli import main
from lac_tpu.config import ByteCodingConfig, LMCodingConfig, MeshConfig, from_dict
from lac_tpu.stream.container import read_container


def _write_corpus(tmp_path, n=3000):
    rng = np.random.default_rng(3)
    words = [b"config ", b"flags ", b"wired ", b"through "]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))]
    p = tmp_path / "in.txt"
    p.write_bytes(bytes(out[:n]))
    return p


def test_cli_byte_flags_reach_container(tmp_path):
    src = _write_corpus(tmp_path)
    dst = tmp_path / "out.lac"
    rc = main(["compress", str(src), "-o", str(dst),
               "--model", "order0n", "--block-size", "512", "--rate", "5"])
    assert rc == 0
    header, _ = read_container(dst.read_bytes())
    assert header.config["block_size"] == 512
    assert header.config["rate"] == 5
    back = tmp_path / "back.txt"
    assert main(["decompress", str(dst), "-o", str(back)]) == 0
    assert back.read_bytes() == src.read_bytes()


def test_cli_lm_flags_reach_container(tmp_path):
    src = _write_corpus(tmp_path, 1200)
    dst = tmp_path / "out.lac"
    rc = main(["compress", str(src), "-o", str(dst),
               "--model", "lm", "--model-ref", "prng:tiny:0",
               "--block-tokens", "256", "--lanes", "4",
               "--window", "128", "--overlap", "4"])
    assert rc == 0
    header, _ = read_container(dst.read_bytes())
    assert header.config["max_seq"] == 128      # --window capped the context
    assert header.config["overlap"] == 4
    assert header.config["lanes"] == 4
    back = tmp_path / "back.txt"
    assert main(["decompress", str(dst), "-o", str(back)]) == 0
    assert back.read_bytes() == src.read_bytes()


def test_from_dict_roundtrips_container_config(tmp_path):
    """A reader can rebuild the typed config from the container dict,
    ignoring unknown/extra keys (forward compatibility)."""
    src = _write_corpus(tmp_path, 1200)
    dst = tmp_path / "out.lac"
    main(["compress", str(src), "-o", str(dst), "--model", "lm",
          "--model-ref", "prng:tiny:0", "--block-tokens", "256", "--lanes", "4"])
    header, _ = read_container(dst.read_bytes())
    cfg = from_dict(LMCodingConfig, header.config)  # extra keys ignored
    assert cfg.block_tokens == 256 and cfg.lanes == 4
    bc = from_dict(ByteCodingConfig, {"model_id": "order1n", "rate": 6, "junk": 1})
    assert bc.model_id == "order1n" and bc.rate == 6
    # the window cap is stored on the wire as max_seq; it must come back as
    # window so re-encoding with the rebuilt config reproduces the schedule
    lm = from_dict(LMCodingConfig, {"max_seq": 128, "overlap": 4})
    assert lm.window == 128 and lm.overlap == 4


def test_mesh_config_builds_mesh():
    import jax

    if len(jax.devices()) < 2:
        return
    mesh = MeshConfig(data=-1, model=2).make()
    assert mesh.shape["model"] == 2
