"""TPU probe for the chunked det8 encode path (run AFTER the trainer frees
the chip; serialize on the one TPU).

1. Bit-equality on REAL TPU hardware: chunked interval stream == serial
   interval stream at byte-12l scale (the CPU tests prove the contract on
   the CPU backend; this checks the TPU compiler makes the same promise).
2. Round-trip: chunked det8 encode -> serial det8 decode at B=256.
3. Throughput: det8 chunked encode tok/s vs det8 serial encode tok/s vs
   float serial encode (the headline: encode becomes prefill-shaped).

Usage: python scratch/det8_chunk_probe.py [1|2|3 ...]  (default: all)
"""
import dataclasses
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp


def guard(fn):
    try:
        fn()
    except Exception:
        traceback.print_exc()


def build_corpus(n):
    import glob

    bufs, tot = [], 0
    for p in sorted(glob.glob("/usr/lib/python3.11/**/*.py", recursive=True)):
        if tot >= n:
            break
        b = open(p, "rb").read()
        bufs.append(b)
        tot += len(b)
    return b"".join(bufs)[:n]


def _setup(b, t):
    from lac_tpu.models.lm_registry import resolve_lm

    cfg, params = resolve_lm("prng:byte-12l:0", max_seq=min(t, 512))
    cfg = dataclasses.replace(cfg, det8=True)
    data = build_corpus(b * t)
    toks = np.frombuffer(data, dtype=np.uint8).reshape(b, t).astype(np.int32)
    lens = np.full((b,), t, np.int32)
    return cfg, params, toks, lens


def s1_equality():
    from lac_tpu.runtime import lm_engine as E
    from lac_tpu.utils.jaxutil import x64

    cfg, params, toks, lens = _setup(8, 256)
    pb = 16

    @x64
    def both():
        lo_s, f_s = E._encode_intervals(
            cfg, params, jnp.asarray(toks), jnp.asarray(lens), pb)
        lo_c, f_c = E._encode_intervals_det(cfg, params, jnp.asarray(toks), pb)
        return (np.asarray(lo_s), np.asarray(f_s), np.asarray(lo_c), np.asarray(f_c))

    lo_s, f_s, lo_c, f_c = both()
    ok = (lo_s == lo_c).all() and (f_s == f_c).all()
    nd = int((lo_s != lo_c).sum() + (f_s != f_c).sum())
    print(f"TPU chunked==serial intervals: {ok} (diff count {nd})")


def s2_roundtrip():
    from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

    cfg, params, toks, lens = _setup(256, 256)
    w, nw = lm_encode(cfg, params, toks, lens, 16)
    d = lm_decode(cfg, params, np.asarray(w), lens, 16, 256)
    print("TPU det8 chunked-encode roundtrip B=256:", (np.asarray(d) == toks).all())


def s3_throughput():
    from lac_tpu.runtime import lm_engine as E
    from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

    cfg, params, toks, lens = _setup(256, 256)
    pb = 16

    def timed(fn, reps=3):
        fn()  # compile+warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return toks.size * reps / (time.perf_counter() - t0)

    etps = timed(lambda: int(jnp.sum(lm_encode(cfg, params, toks, lens, pb)[1])))
    print(f"det8 CHUNKED encode B=256: {etps/1e3:.1f}k tok/s")
    dt = timed(lambda: int(jnp.sum(lm_decode(
        cfg, params, np.asarray(lm_encode(cfg, params, toks, lens, pb)[0]),
        lens, pb, 256))), reps=1)
    print(f"det8 serial decode B=256 (incl. one encode): {dt/1e3:.1f}k tok/s combined-denominator")

    # serial det8 encode for comparison (the old path)
    from lac_tpu.utils.jaxutil import x64

    @x64
    def serial_encode():
        lo, f = E._encode_intervals(
            cfg, params, jnp.asarray(toks), jnp.asarray(lens), pb)
        return int(jnp.sum(f))

    stps = timed(serial_encode)
    print(f"det8 SERIAL encode intervals B=256: {stps/1e3:.1f}k tok/s")


if __name__ == "__main__":
    stages = {"1": s1_equality, "2": s2_roundtrip, "3": s3_throughput}
    args = sys.argv[1:] or ["1", "2", "3"]
    for a in args:
        print(f"=== stage {a} [{time.strftime('%H:%M:%S')}] ===", flush=True)
        guard(stages[a])
    print("det8 chunk probe done")
