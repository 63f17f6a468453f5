"""Benchmark entry point for the driver: prints ONE JSON line.

Measures end-to-end encode+decode throughput of the fused-Pallas byte
coding path (turbo; order0n nibble-factorized codec) on a 4 MiB
deterministic local-text corpus on
the default device (real TPU v5e under the driver), and checks a bit-exact
round-trip. Device throughput is measured with median-of-5 timed runs
synchronized by tiny scalar fetches (full-array fetches would measure the
harness tunnel, not the chip).

Every section runs under its own try/except: a failing row records
``<section>_error`` in ``detail`` and the final JSON ALWAYS prints (round 2
lost every measured number to one RESOURCE_EXHAUSTED in the last row).

vs_baseline: the reference pipeline is a pure-Python token-serial coder
measured at ~0.013 MB/s on this corpus class (survey session; our oracle
coder reproduces that speed). vs_baseline = combined MB/s / 0.013.
"""

import glob
import json
import os
import statistics
import sys
import time
import traceback

# Flagship ratio checkpoint preference, in order. ONLY measured-and-gated
# checkpoints belong here (promotion gate: held-out bpb on heldout_slice()
# must beat SHIPPED_FLAGSHIP_BPB — tools/ratio_probe_2k.py). The ungated
# byte16l-2k snapshot was removed after it OOMed the round-2 driver bench.
FLAGSHIP_CKPTS = (
    "/root/repo/checkpoints/byte16l-pysrc.npz",
    "/root/repo/checkpoints/byte12l-pysrc.npz",
)
# Shipped flagship figure (BASELINE.md: byte-16l, block 65536, window 1024,
# slide mode on heldout_slice() — measurements/r4_slide_b64k_seg.log). The
# gate history: slide beat reprime at block 4096 (0.8758 vs 0.8769/0.8776,
# r3_slide.log); block 16384 cut the per-block cold-start fraction 25%->6%
# for 0.8188 single-scan (r3_slide_b16k.log) / 0.8193 on the segmented
# slide_seg=512 default (r4_slide_b16k_warm.log); and the segmented
# schedule then collapsed the block-65536 wall from 516 s (r3 single-scan,
# driver-budget-hostile) to 71 s, making the max-ratio block the bench
# config: cold start 1.5% of tokens, 0.8032 bpb at lanes 4 (the 256 KiB
# slice = exactly 4 blocks). Promotion gates compare against this.
SHIPPED_FLAGSHIP_BPB = 0.8032

# Shipped flagship coding config (must match the BASELINE.md row).
FLAGSHIP_BLOCK = 65536
FLAGSHIP_LANES = 4
FLAGSHIP_OVERLAP = 8          # used by the reprime fallback only
FLAGSHIP_WINDOW_MODE = "slide"


def build_corpus(n: int) -> bytes:
    files = sorted(glob.glob("/usr/lib/python3.11/*.py"))
    data = b"".join(open(f, "rb").read() for f in files)
    if len(data) < n:
        data = data * (n // max(1, len(data)) + 1)
    return data[:n]


def heldout_slice(n: int = 262144) -> bytes:
    """The flagship held-out slice: every 13th stdlib .py file (recursive),
    first ``n`` bytes. Training corpora exclude these files by hash
    (tools/build_corpus.py); ratio probes and bench.py must share this
    exact construction or gates silently compare different data."""
    files = sorted(glob.glob("/usr/lib/python3.11/**/*.py", recursive=True))
    held = [f for i, f in enumerate(files) if i % 13 == 0]
    return b"".join(open(f, "rb").read() for f in held)[:n]


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import numpy as np
    import jax.numpy as jnp

    detail: dict = {}
    primary: dict = {"value": None}

    def section(name):
        """Decorator: run the section, record errors instead of dying."""
        def run(fn):
            try:
                fn()
            except Exception as e:
                detail[f"{name}_error"] = (
                    f"{type(e).__name__}: {e}"[:400]
                )
                traceback.print_exc(file=sys.stderr)
        return run

    def med(fn, n=5, reps=10):
        # sustained throughput: `reps` back-to-back device calls per scalar
        # sync, so the harness-tunnel round-trip (~35ms) is amortized the way
        # pipelined production waves amortize it
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = None
            for _ in range(reps):
                r = fn()
            jnp.sum(r).block_until_ready()
            int(jnp.sum(r))
            ts.append((time.perf_counter() - t0) / reps)
        return statistics.median(ts)

    V, PB, RATE = 256, 16, 4
    B, T = 32768, 1024  # 4x 2048-lane sub-kernels per dispatch (one executable)
    data = build_corpus(B * T)
    n_mb = len(data) / 1e6

    @section("order0n")
    def _order0n():
        from lac_tpu.ops.pallas_rans import o0n_encode_fused, o0n_rans32_decode
        from lac_tpu.runtime.turbo import turbo_compress, turbo_decompress

        # correctness: full host round-trip through the container
        c = turbo_compress(data, block_size=T)
        assert turbo_decompress(c) == data, "round-trip mismatch"
        bpb = 8 * len(c) / len(data)

        # throughput: device-resident, scalar-fetch synchronized
        arr = np.frombuffer(data, dtype=np.uint8).reshape(B, T).T.astype(np.int32)
        syms_d = jnp.asarray(arr)
        lengths = jnp.full((B,), T, dtype=jnp.int32)

        def encode(s):
            # same cap production turbo_compress uses (raw fallback bounds
            # coded lanes below block_size//2 words)
            return o0n_encode_fused(s, lengths[None, :], RATE, T // 2 + 3)

        words_full, nw = encode(syms_d)
        maxw = int(jnp.max(nw))  # compile+sync
        cap = next(c for c in (64, 128, 192, 256, 384, 512, T // 2 + 3) if c >= maxw)
        words = jnp.asarray(jnp.asarray(words_full)[:, :cap])
        d = o0n_rans32_decode(words, lengths, T, RATE)
        int(jnp.sum(d))

        te = med(lambda: encode(syms_d)[1])
        td = med(lambda: o0n_rans32_decode(words, lengths, T, RATE))
        enc_mbs, dec_mbs = n_mb / te, n_mb / td
        combined = 2 * n_mb / (te + td)
        baseline = 0.013  # reference-class pure-Python coder, MB/s
        primary["value"] = round(combined, 3)
        primary["vs_baseline"] = round(combined / baseline, 1)
        detail.update({
            "encode_MBps": round(enc_mbs, 3),
            "decode_MBps": round(dec_mbs, 3),
            "bits_per_byte": round(bpb, 4),
            "corpus": "python-source (stdlib .py files; no enwik8 in this image)",
            "corpus_MiB": round(len(data) / (1 << 20), 2),
            "lanes": B,
            "block": T,
        })

    @section("order1n")
    def _order1n():
        # ratio codec (order1n): same sustained full-wave protocol as
        # order0n (same lanes, same cap bucketing, same reps-per-sync) so
        # the two rows in BASELINE.md are directly comparable
        from lac_tpu.ops.pallas_rans import o1n_encode_fused, o1n_rans32_decode

        arr = np.frombuffer(data, dtype=np.uint8).reshape(B, T).T.astype(np.int32)
        syms_d = jnp.asarray(arr)
        lengths = jnp.full((B,), T, dtype=jnp.int32)
        w1, nw1 = o1n_encode_fused(syms_d, lengths[None, :], RATE, T // 2 + 3)
        o1n_bpb = 16 * float(jnp.mean(nw1)) / T
        maxw1 = int(jnp.max(nw1))
        cap1 = next(c for c in (64, 128, 192, 256, 384, 512, T // 2 + 3) if c >= maxw1)
        words1 = jnp.asarray(jnp.asarray(w1)[:, :cap1])
        mb1 = B * T / 1e6
        t1e = med(lambda: o1n_encode_fused(syms_d, lengths[None, :], RATE, T // 2 + 3)[1])
        t1d = med(lambda: o1n_rans32_decode(words1, lengths, T, RATE))
        detail.update({
            "order1n_encode_MBps": round(mb1 / t1e, 1),
            "order1n_decode_MBps": round(mb1 / t1d, 1),
            "order1n_bits_per_byte": round(o1n_bpb, 4),
        })

    @section("order2n")
    def _order2n():
        # ratio rung (order2n): 64-context lo table at its block-4096 design
        # point (same sustained protocol; 4096 lanes x 4096-byte blocks)
        from lac_tpu.ops.pallas_rans import o2n_encode_fused, o2n_rans32_decode

        B2, T2 = 4096, 4096
        data2 = build_corpus(B2 * T2)
        arr2 = np.frombuffer(data2, dtype=np.uint8).reshape(B2, T2).T.astype(np.int32)
        syms2 = jnp.asarray(arr2)
        l2 = jnp.full((B2,), T2, dtype=jnp.int32)
        w2, nw2 = o2n_encode_fused(syms2, l2[None, :], RATE, T2 // 2 + 3)
        o2n_bpb = 16 * float(jnp.mean(nw2)) / T2
        maxw2 = int(jnp.max(nw2))
        cap2b = next(c for c in (256, 384, 512, 768, 1024, 1536, 2048, T2 // 2 + 3)
                     if c >= maxw2)
        words2 = jnp.asarray(jnp.asarray(w2)[:, :cap2b])
        mb2 = B2 * T2 / 1e6
        t2e = med(lambda: o2n_encode_fused(syms2, l2[None, :], RATE, T2 // 2 + 3)[1])
        t2d = med(lambda: o2n_rans32_decode(words2, l2, T2, RATE))
        detail.update({
            "order2n_encode_MBps": round(mb2 / t2e, 1),
            "order2n_decode_MBps": round(mb2 / t2d, 1),
            "order2n_bits_per_byte": round(o2n_bpb, 4),
            "order2n_block": T2,
        })

    @section("lm_byte12l")
    def _lm():
        # LM-path throughput (flagship capability): lock-step coding with
        # the ~28M-param byte LM preset, B lanes in one jitted scan
        import dataclasses as _dc

        from lac_tpu.models.lm_registry import resolve_lm
        from lac_tpu.runtime.lm_engine import GROW_BUCKET as GROW
        from lac_tpu.runtime.lm_engine import lm_decode, lm_encode

        cfg, params = resolve_lm("prng:byte-12l:0", max_seq=256)
        lb, lt = 256, 256
        ltoks = np.frombuffer(data[: lb * lt], dtype=np.uint8).reshape(lb, lt).astype(np.int32)
        llens = np.full((lb,), lt, np.int32)
        lw, lnw = lm_encode(cfg, params, ltoks, llens, PB, cache_grow=GROW)
        jnp.sum(lnw).block_until_ready(); int(jnp.sum(lnw))
        t0 = time.perf_counter()
        lw, lnw = lm_encode(cfg, params, ltoks, llens, PB, cache_grow=GROW)
        int(jnp.sum(lnw))
        detail["lm_byte12l_encode_tok_s"] = round(lb * lt / (time.perf_counter() - t0), 0)
        lwn = np.asarray(lw)
        ld = lm_decode(cfg, params, lwn, llens, PB, lt, cache_grow=GROW)
        int(jnp.sum(ld))
        t0 = time.perf_counter()
        ld = lm_decode(cfg, params, lwn, llens, PB, lt, cache_grow=GROW)
        int(jnp.sum(ld))
        detail["lm_byte12l_decode_tok_s"] = round(lb * lt / (time.perf_counter() - t0), 0)
        assert (np.asarray(ld) == ltoks).all(), "LM round-trip mismatch"

        # kv8 (opt-in int8 KV cache): the fast LM mode — +54% encode on v5e
        # (MEASUREMENTS.md); containers carry the flag so both sides run the
        # identical perturbed forward and the round-trip stays exact
        kcfg = _dc.replace(cfg, kv8=True)
        kw, knw = lm_encode(kcfg, params, ltoks, llens, PB, cache_grow=GROW)
        jnp.sum(knw).block_until_ready(); int(jnp.sum(knw))
        t0 = time.perf_counter()
        kw, knw = lm_encode(kcfg, params, ltoks, llens, PB, cache_grow=GROW)
        int(jnp.sum(knw))
        detail["lm_byte12l_kv8_encode_tok_s"] = round(lb * lt / (time.perf_counter() - t0), 0)
        kwn = np.asarray(kw)
        kd = lm_decode(kcfg, params, kwn, llens, PB, lt, cache_grow=GROW)
        int(jnp.sum(kd))
        t0 = time.perf_counter()
        kd = lm_decode(kcfg, params, kwn, llens, PB, lt, cache_grow=GROW)
        int(jnp.sum(kd))
        detail["lm_byte12l_kv8_decode_tok_s"] = round(lb * lt / (time.perf_counter() - t0), 0)
        assert (np.asarray(kd) == ltoks).all(), "kv8 LM round-trip mismatch"

    @section("lm_trained")
    def _flagship():
        # flagship ratio demo: trained checkpoint on held-out bytes through
        # the full container API (windowed blocks), bit-exact round-trip
        import gzip

        from lac_tpu.models.lm_registry import resolve_lm
        from lac_tpu.runtime.lm_api import lm_compress_bytes, lm_decompress_bytes

        ckpt = next((c for c in FLAGSHIP_CKPTS if os.path.exists(c)), None)
        if ckpt is None:
            return
        hdata = heldout_slice()
        model = resolve_lm(f"file:{ckpt}", None)
        # shipped config: block 4096, overlap 8 (window = the checkpoint's
        # max_seq, capped at the TRAIN length — RoPE positions past ~1.5x it
        # collapse, measured 2.8 b/B at 768-1023 vs 0.84 in-distribution;
        # ov8 keeps 7/8 of the window at re-prime: 0.8765 vs ov4's 0.8809
        # bpb on byte-16l, MEASUREMENTS.md)
        hc = lm_compress_bytes(
            hdata, model_ref=f"file:{ckpt}", block_tokens=FLAGSHIP_BLOCK,
            lanes=FLAGSHIP_LANES, overlap=FLAGSHIP_OVERLAP, model=model,
            window_mode=FLAGSHIP_WINDOW_MODE,
            cache_grow=0 if FLAGSHIP_WINDOW_MODE == "slide" else 128,
        )
        assert lm_decompress_bytes(hc, model=model) == hdata, "LM ckpt round-trip"
        detail.update({
            "lm_trained_heldout_bpb": round(8 * len(hc) / len(hdata), 4),
            "gzip9_same_split_bpb": round(
                8 * len(gzip.compress(hdata, 9)) / len(hdata), 4
            ),
            "lm_trained_ckpt": os.path.basename(ckpt),
            "lm_trained_window_mode": FLAGSHIP_WINDOW_MODE,
        })

    @section("lm_tinyllama")
    def _lm_tinyllama():
        # BASELINE config #3 (TinyLlama batched block-parallel coding) in a
        # subprocess under a hard timeout, like the 7B row: B=256
        # first-compiles wedged 4x across rounds 2-3 (service-side stall),
        # so the row runs the proven B=128 shapes; the persistent compile
        # cache makes it cheap when the round's probes already built them
        import subprocess

        r = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_tinyllama_row.py"],
            capture_output=True, text=True, timeout=1500,
        )
        if r.returncode != 0:
            raise RuntimeError(f"tinyllama row rc={r.returncode}: {r.stderr[-300:]}")
        detail.update(json.loads(r.stdout.strip().splitlines()[-1]))

    @section("lm_7b")
    def _lm7b():
        # flagship-scale capability row (BASELINE config #4): runs in a
        # SUBPROCESS under a hard timeout because the remote compile service
        # occasionally wedges >20 min — a wedge must cost one row, not the
        # whole round's JSON
        import subprocess

        r = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_7b_row.py"],
            capture_output=True, text=True, timeout=1200,
        )
        if r.returncode != 0:
            raise RuntimeError(f"7b row rc={r.returncode}: {r.stderr[-300:]}")
        detail.update(json.loads(r.stdout.strip().splitlines()[-1]))

    @section("lm_8b")
    def _lm8b():
        # BASELINE config #5's single-chip leg (Llama-3-8B w8, B=96, staged
        # init) — subprocess + hard timeout like the 7B row; the staged init
        # adds ~2 min of dispatches, the compile cache covers the rest
        import subprocess

        r = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_8b_row.py"],
            capture_output=True, text=True, timeout=1800,
        )
        if r.returncode != 0:
            raise RuntimeError(f"8b row rc={r.returncode}: {r.stderr[-300:]}")
        detail.update(json.loads(r.stdout.strip().splitlines()[-1]))

    print(json.dumps({
        "metric": "byte-path (order0n turbo) encode+decode throughput, 1 chip",
        "value": primary.get("value"),
        "unit": "MB/s",
        "vs_baseline": primary.get("vs_baseline"),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
