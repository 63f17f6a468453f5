"""Training subsystem: loss decreases, checkpoints round-trip, and a
trained model plugs into the LM coding path via model_ref file:<path>."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lac_tpu.models.transformer import tiny_config
from lac_tpu.train import lm_loss, load_checkpoint, save_checkpoint, train_byte_lm


def _corpus(n=20000):
    rng = np.random.default_rng(0)
    words = [b"alpha ", b"beta ", b"gamma ", b"delta(x) ", b"return y\n"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))]
    return bytes(out[:n])


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_config(vocab=256, max_seq=64, dtype=jnp.float32)
    params, losses = train_byte_lm(
        cfg, _corpus(), steps=60, batch=16, seq=32, lr=1e-3, log_every=59
    )
    return cfg, params, losses


def test_loss_decreases(trained):
    cfg, params, losses = trained
    assert losses[-1] < losses[0] * 0.8, losses


def test_trained_model_beats_uniform(trained):
    cfg, params, _ = trained
    toks = jnp.asarray(
        np.frombuffer(_corpus(2000)[:1025], np.uint8)[None, :].astype(np.int32)
    )
    loss = float(jax.jit(lm_loss, static_argnums=0)(cfg, params, toks[:, :33]))
    assert loss / np.log(2) < 6.0  # well under the 8 bits/byte of uniform


def test_checkpoint_roundtrip(tmp_path, trained):
    cfg, params, _ = trained
    path = str(tmp_path / "m.npz")
    save_checkpoint(path, cfg, params)
    cfg2, params2 = load_checkpoint(path)
    assert cfg2 == cfg
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.dtype == b.dtype and a.shape == b.shape
        assert (np.asarray(a) == np.asarray(b)).all()


def test_file_model_ref_coding_roundtrip(tmp_path, trained):
    from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

    cfg, params, _ = trained
    path = str(tmp_path / "m.npz")
    save_checkpoint(path, cfg, params)
    data = _corpus(3000)
    c = lm_compress_bytes(data, model_ref=f"file:{path}", block_tokens=64, lanes=8)
    assert lm_decompress_bytes(c) == data
    # trained on this distribution: must compress well below raw
    assert len(c) < len(data) * 0.8


class TestShippedCheckpoint:
    """The in-repo trained byte-6l checkpoint must load, round-trip, and
    beat the order-0 codec's ratio decisively on held-out text."""

    PATH = "/root/repo/checkpoints/byte6l-pysrc.npz"

    def test_loads_and_compresses_heldout(self):
        import glob
        import os

        from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

        if not os.path.exists(self.PATH):
            pytest.skip("checkpoint not built")
        files = sorted(glob.glob("/usr/lib/python3.11/**/*.py", recursive=True))
        held = [f for i, f in enumerate(files) if i % 13 == 0]
        data = b"".join(open(f, "rb").read() for f in held)[:16384]
        c = lm_compress_bytes(
            data, model_ref=f"file:{self.PATH}", block_tokens=512, lanes=8
        )
        assert lm_decompress_bytes(c) == data
        bpb = 8 * len(c) / len(data)
        assert bpb < 3.0, f"trained model should beat order0 (~4.7): {bpb}"


def test_warm_start_continuation(tmp_path, trained):
    """init= warm-starts from an existing checkpoint: the continuation run
    starts near the donor's loss, not from scratch."""
    cfg, params, losses = trained
    p = tmp_path / "donor.npz"
    save_checkpoint(str(p), cfg, params)
    _, donor = load_checkpoint(str(p))
    _, cont_losses = train_byte_lm(
        cfg, _corpus(), steps=10, batch=16, seq=32, lr=1e-4, init=donor,
        log_every=1,
    )
    # a fresh init starts around ln(256) = 5.5 nats; the warm start must
    # begin close to where the donor run ended
    assert cont_losses[0] < losses[0] * 0.6
    assert cont_losses[0] < losses[-1] * 1.5


def test_fused_bf16s_loss_matches_exact(trained):
    """The training-only fused-attention path (round 5): "bf16s" must agree
    with the exact prefill branch to bf16 tolerance (it is the shipped
    training config — measurements/r5_train_profile2.log, +29% tok/s).
    Coding paths never set fused; this guards the training loss surface."""
    from lac_tpu.models import transformer as T

    cfg, params, _ = trained
    toks = jnp.asarray(
        np.frombuffer(_corpus(16 * 33), dtype=np.uint8)
        .reshape(16, 33).astype(np.int32))
    le = float(lm_loss(cfg, params, toks, fused=False, remat=False))
    old = T._FUSED["impl"]
    T._FUSED["impl"] = "bf16s"
    try:
        lb = float(lm_loss(cfg, params, toks, fused=True, remat=False))
        g = jax.grad(lambda p: lm_loss(cfg, p, toks, fused=True, remat=False))(params)
    finally:
        T._FUSED["impl"] = old
    assert abs(lb - le) < 5e-3, (lb, le)
    assert all(bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
               for x in jax.tree.leaves(g))


def test_fused_ignored_on_decode_steps(trained):
    """fused=True only affects prefill (S>1, empty cache); single-token
    steps — the coding schedule — take the exact branch regardless, so a
    stray fused flag cannot change bitstreams."""
    from lac_tpu.models.transformer import forward, init_cache

    cfg, params, _ = trained
    toks = jnp.asarray(np.arange(4, dtype=np.int32).reshape(4, 1))
    cache = init_cache(cfg, 4, 32)
    a, _ = forward(cfg, params, toks, cache, fused=False)
    b, _ = forward(cfg, params, toks, cache, fused=True)
    assert (np.asarray(a) == np.asarray(b)).all()
