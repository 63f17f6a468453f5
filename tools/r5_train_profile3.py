"""Round-5 training tuning, probe 3: last two candidates on top of probe
2's winner (bf16s 75.8k tok/s at B=64) — unrolled layer scan, and splash
with full-row kv blocks — then the training run launches with the winner.
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
from lac_tpu.models import transformer as T
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as SK,
)

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


def run(name, fused, reps=10, bsz=64, unroll=False):
    try:
        opt_state = opt.init(master)

        @jax.jit
        def step_fn(m, os_, toks):
            def loss_of(mm):
                p = jax.tree.map(lambda x: x.astype(cfg.dtype), mm)
                return lm_loss(cfg, p, toks, fused=fused, unroll=unroll)
            loss, grads = jax.value_and_grad(loss_of)(m)
            updates, os_ = opt.update(grads, os_, m)
            return optax.apply_updates(m, updates), os_, loss

        m, os_ = master, opt_state
        t0 = time.time()
        m, os_, loss = step_fn(m, os_, batch(bsz))
        c = time.time() - t0
        m, os_, loss = step_fn(m, os_, batch(bsz))
        float(loss)
        t0 = time.time()
        for _ in range(reps):
            m, os_, loss = step_fn(m, os_, batch(bsz))
        lv = float(loss)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.0f} ms/step = {bsz*SEQ/dt:,.0f} tok/s "
              f"(compile {c:.0f}s, loss {lv:.4f})", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


T._FUSED["impl"] = "bf16s"
run("bf16s unroll ", True, unroll=True)
T._FUSED["impl"] = "splash"
T._FUSED["splash_bs"] = SK.BlockSizes(
    block_q=1024, block_kv=1024, block_kv_compute=512,
    block_q_dkv=1024, block_kv_dkv=1024, block_kv_dkv_compute=512,
    use_fused_bwd_kernel=True)
run("splash fbwd1k", True)
print("probe3 done", flush=True)
