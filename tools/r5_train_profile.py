"""Round-5 VERDICT item 4: profile the training step BEFORE the byte-20l run.

Round 4 measured 58.1k train tok/s (41M params, B=64 x seq 1024) ~= 7% of
v5e bf16 peak, never profiled. Hypothesis from reading the prefill branch
(models/transformer.py _attention): the exact path materializes a
[B, H, S, S] f32 score tensor (+ its softmax) per layer = ~2.1 GB of HBM
write+read per layer per pass at these shapes — attention HBM traffic, not
MXU FLOPs, bounds the step. The flash-kernel prefill (_flash_prefill)
streams K/V through VMEM with an online softmax, so scores never touch HBM.

Matrix timed here (one process, shared connect/compile budget):
  exact+remat   — the round-4 recipe (baseline; should reproduce ~58k)
  flash+remat   — fused attention, same remat policy
  flash+noremat — fused attention, no layer remat (scores no longer OOM;
                  saves the forward recompute in backward)
  flash+remat B=128 — batch amortization check
Plus a fwd-loss cross-check exact vs flash on one fixed batch (training-
only numerics: expect bf16-class deltas, NOT bit equality).

The winner becomes the byte-20l run config (tools/train_byte20l_r5.py).
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from lac_tpu.train import load_checkpoint, lm_loss
from lac_tpu.models.transformer import init_params  # noqa: F401 (import warms module)

f32 = jnp.float32

icfg, init = load_checkpoint("checkpoints/byte16l-pysrc.npz")
idx = np.asarray(list(range(16)) + [12, 13, 14, 15])
init = dict(init)
init["layers"] = {
    k: (np.take(np.asarray(v), idx, axis=0) if not isinstance(v, dict) else
        {kk: np.take(np.asarray(vv), idx, axis=0) for kk, vv in v.items()})
    for k, v in init["layers"].items()
}
cfg = dataclasses.replace(icfg, n_layers=20, max_seq=1088)
print("devices:", jax.devices(), flush=True)

corpus = np.frombuffer(open("scratch/corpus_train.bin", "rb").read(), dtype=np.uint8)
rng = np.random.default_rng(7)
SEQ = 1024


def batch(bsz):
    starts = rng.integers(0, len(corpus) - SEQ - 1, size=bsz)
    return jnp.asarray(
        np.stack([corpus[s: s + SEQ + 1] for s in starts]).astype(np.int32))


master = jax.tree.map(lambda x: jnp.asarray(x).astype(f32), init)
opt = optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=0.01)


def make_step(fused, remat):
    opt_state = opt.init(master)

    @jax.jit
    def step_fn(m, os_, toks):
        def loss_of(mm):
            p = jax.tree.map(lambda x: x.astype(cfg.dtype), mm)
            return lm_loss(cfg, p, toks, fused=fused, remat=remat)
        loss, grads = jax.value_and_grad(loss_of)(m)
        updates, os_ = opt.update(grads, os_, m)
        return optax.apply_updates(m, updates), os_, loss

    return step_fn, opt_state


# ---- fwd loss cross-check (exact vs flash, same batch, same params) ----
toks0 = batch(64)
pbf = jax.tree.map(lambda x: x.astype(cfg.dtype), master)
le = float(jax.jit(lambda p, t: lm_loss(cfg, p, t, fused=False))(pbf, toks0))
lf = float(jax.jit(lambda p, t: lm_loss(cfg, p, t, fused=True))(pbf, toks0))
print(f"fwd loss exact={le:.6f} flash={lf:.6f} delta={lf-le:+.2e}", flush=True)

variants = [
    ("exact+remat  B=64 ", False, True, 64, 10),
    ("flash+remat  B=64 ", True, True, 64, 10),
    ("flash+noremat B=64", True, False, 64, 10),
    ("flash+remat  B=128", True, True, 128, 6),
]
for name, fused, remat, bsz, reps in variants:
    try:
        step_fn, opt_state = make_step(fused, remat)
        m, os_ = master, opt_state
        t0 = time.time()
        m, os_, loss = step_fn(m, os_, batch(bsz))
        print(f"{name}: first step (incl compile) {time.time()-t0:.1f}s "
              f"loss {float(loss):.4f}", flush=True)
        m, os_, loss = step_fn(m, os_, batch(bsz))
        float(loss)  # sync
        t0 = time.time()
        for _ in range(reps):
            m, os_, loss = step_fn(m, os_, batch(bsz))
        lv = float(loss)  # sync
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.0f} ms/step = {bsz*SEQ/dt:,.0f} tok/s "
              f"(loss {lv:.4f})", flush=True)
        del m, os_, step_fn, opt_state
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
print("probe done", flush=True)
