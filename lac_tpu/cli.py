"""Command-line interface: ``python -m lac_tpu compress|decompress|info|bench``.

The reference has no CLI (SURVEY.md §0); this is the entry-point surface of
the framework."""

from __future__ import annotations

import argparse
import sys
import time


def _make_mesh_arg(args):
    """--mesh-model/--mesh-data -> Mesh | None (the config layer's
    MeshConfig is the source of truth for geometry resolution)."""
    if getattr(args, "mesh_model", 1) == 1 and getattr(args, "mesh_data", 0) == 0:
        return None
    from .config import MeshConfig

    data = args.mesh_data if args.mesh_data else -1
    return MeshConfig(data=data, model=args.mesh_model).make()


def _cmd_compress(args) -> int:
    data = open(args.file, "rb").read()
    t0 = time.perf_counter()
    if args.model == "lm":
        from .config import LMCodingConfig
        from .runtime.lm_api import lm_compress_bytes

        cfg = LMCodingConfig(
            model_ref=args.model_ref,
            block_tokens=args.block_tokens,
            lanes=args.lanes,
            prob_bits=args.prob_bits,
            window=args.window,
            overlap=args.overlap,
            det8=args.det8,
            kv8=args.kv8,
            w8=args.w8,
            cache_grow=args.cache_grow,
            window_mode=args.window_mode,
            slide_seg=args.slide_seg,
        )
        out = lm_compress_bytes(data, mesh=_make_mesh_arg(args), **cfg.engine_kwargs())
    else:
        from .config import ByteCodingConfig
        from .runtime.engine import compress_bytes

        cfg = ByteCodingConfig(
            model_id=args.model,
            block_size=args.block_size,
            prob_bits=args.prob_bits,
            rate=args.rate,
        )
        out = compress_bytes(data, **cfg.engine_kwargs())
    dt = time.perf_counter() - t0
    dst = args.output or args.file + ".lac"
    with open(dst, "wb") as f:
        f.write(out)
    bpb = 8 * len(out) / max(1, len(data))
    print(
        f"{args.file}: {len(data)} -> {len(out)} bytes "
        f"({bpb:.4f} bpb, {len(data) / dt / 1e6:.2f} MB/s) -> {dst}"
    )
    return 0


def _cmd_decompress(args) -> int:
    from .stream.container import read_container

    data = open(args.file, "rb").read()
    t0 = time.perf_counter()
    header, _ = read_container(data)
    if header.model_id == "lm":
        from .runtime.lm_api import lm_decompress_bytes

        out = lm_decompress_bytes(data)
    else:
        from .runtime.engine import decompress_bytes

        out = decompress_bytes(data)
    dt = time.perf_counter() - t0
    dst = args.output or (
        args.file[:-4] if args.file.endswith(".lac") else args.file + ".out"
    )
    with open(dst, "wb") as f:
        f.write(out)
    print(f"{args.file}: {len(data)} -> {len(out)} bytes ({len(out) / dt / 1e6:.2f} MB/s) -> {dst}")
    return 0


def _cmd_verify(args) -> int:
    from .stream.container import verify_container

    rep = verify_container(open(args.file, "rb").read())
    print(
        f"codec={rep['codec']} model={rep['model_id']} blocks={rep['n_blocks']} "
        f"original_len={rep['original_len']}"
    )
    if rep["ok"]:
        print("all block checksums OK")
        return 0
    print(f"CORRUPT blocks (index, byte span): "
          f"{[(i, rep['block_spans'][i]) for i in rep['bad_blocks']]}")
    return 1


def _cmd_recover(args) -> int:
    """Recover the good prefix of a truncated/corrupt container (reference
    partial-decode parity, arithmetic_coding.py:331-336)."""
    import dataclasses

    from .stream.container import scan_container, write_container

    data = open(args.file, "rb").read()
    header, blocks, bad = scan_container(data)
    if header.model_id == "lm":
        from .runtime.lm_api import lm_decompress_prefix

        out, rep = lm_decompress_prefix(data)
    else:
        ngood = bad[0] if bad else len(blocks)
        good = blocks[:ngood]
        h2 = dataclasses.replace(
            header, original_len=sum(b.raw_len for b in good)
        )
        from .runtime.engine import decompress_bytes

        out = decompress_bytes(write_container(h2, good))
        rep = {
            "ok": not bad,
            "recovered_blocks": ngood,
            "total_blocks": len(blocks),
            "bad_blocks": bad,
            "recovered_bytes": len(out),
            "original_len": header.original_len,
        }
    dst = args.output or args.file + ".recovered"
    with open(dst, "wb") as f:
        f.write(out)
    print(
        f"recovered {rep['recovered_blocks']}/{rep['total_blocks']} blocks "
        f"({rep['recovered_bytes']}/{rep['original_len']} bytes) -> {dst}"
        + (f"; bad blocks {rep['bad_blocks']}" if rep["bad_blocks"] else "")
    )
    return 0 if rep["ok"] else 1


def _cmd_bench(args) -> int:
    """Round-trip benchmark on FILE: compress, decompress, verify, report."""
    data = open(args.file, "rb").read()
    from .config import ByteCodingConfig
    from .runtime.engine import compress_bytes, decompress_bytes

    cfg = ByteCodingConfig(
        model_id=args.model, block_size=args.block_size, prob_bits=args.prob_bits
    )
    # warm (compile) once, then time
    out = compress_bytes(data, **cfg.engine_kwargs())
    t0 = time.perf_counter()
    out = compress_bytes(data, **cfg.engine_kwargs())
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = decompress_bytes(out)
    t_dec = time.perf_counter() - t0
    ok = back == data
    import json as _json

    print(_json.dumps({
        "file": args.file,
        "model": args.model,
        "bytes": len(data),
        "compressed": len(out),
        "bits_per_byte": round(8 * len(out) / max(1, len(data)), 4),
        "encode_MBps": round(len(data) / t_enc / 1e6, 3),
        "decode_MBps": round(len(data) / t_dec / 1e6, 3),
        "roundtrip_ok": ok,
    }))
    return 0 if ok else 1


def _cmd_train(args) -> int:
    """Train a byte LM on FILE and save a checkpoint usable as
    --model lm --model-ref file:<output>."""
    from .models.lm_registry import PRESETS
    from .train import save_checkpoint, train_byte_lm

    import dataclasses

    corpus = open(args.file, "rb").read()
    cfg = PRESETS[args.preset]()
    init = None
    if args.init:
        from .train import load_checkpoint

        icfg, init = load_checkpoint(args.init)
        # the checkpoint's max_seq may be capped below the preset's; all
        # other architecture fields must match for the params to fit
        import dataclasses as _dc

        if _dc.replace(icfg, max_seq=cfg.max_seq) != cfg:
            raise SystemExit(
                f"--init checkpoint architecture does not match preset "
                f"'{args.preset}'"
            )
    params, losses = train_byte_lm(
        cfg, corpus, steps=args.steps, batch=args.batch, seq=args.seq,
        lr=args.lr, seed=args.seed, log_every=max(1, args.steps // 20),
        init=init,
    )
    # RoPE positions beyond the training sequence length degrade (measured
    # 0.98 b/B at 1-1.5x train seq, 2.77 beyond, vs 0.84 in-distribution);
    # cap the checkpoint's usable context so the coding engines window
    # within trained positions
    save_checkpoint(
        args.output, dataclasses.replace(cfg, max_seq=min(cfg.max_seq, args.seq)),
        params,
    )
    print(f"saved {args.output} (final loss {losses[-1]:.4f} nats, "
          f"{losses[-1] / 0.6931:.3f} bits/byte train)")
    return 0


def _cmd_info(args) -> int:
    from .stream.container import read_container

    header, blocks = read_container(open(args.file, "rb").read())
    total_payload = sum(len(b.payload) for b in blocks)
    print(f"codec={header.codec} prob_bits={header.prob_bits} model={header.model_id}")
    print(f"config={header.config}")
    print(f"original_len={header.original_len} blocks={len(blocks)} payload={total_payload}B")
    if header.original_len:
        print(f"ratio={8 * total_payload / header.original_len:.4f} bpb (payload only)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lac", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress", help="compress FILE into a .lac container")
    c.add_argument("file")
    c.add_argument("-o", "--output")
    c.add_argument("--model", default="order0n",
                   help="model id: order0n (fast) / order1n / order2n (ratio; block>=4096) / order0c (turbo), order0/markov1[cd] (XLA), lm")
    c.add_argument("--block-size", type=int, default=1 << 12)
    c.add_argument("--prob-bits", type=int, default=16)
    c.add_argument("--rate", type=int, default=4,
                   help="adaptation rate base (turbo byte models)")
    c.add_argument("--model-ref", default="prng:byte-12l:0",
                   help="LM predictor ref (prng:<preset>:<seed>, hf:<path> or file:<path>)")
    c.add_argument("--block-tokens", type=int, default=512)
    c.add_argument("--lanes", type=int, default=64)
    c.add_argument("--window", type=int, default=None,
                   help="LM context window cap in tokens (default: model context)")
    c.add_argument("--cache-grow", type=int, default=128, metavar="B",
                   help="KV-cache growth bucket for LM coding (0 = fixed "
                        "width; the schedule is recorded in the container)")
    c.add_argument("--overlap", type=int, default=2,
                   help="window re-prime keep fraction denominator (reference semantics)")
    c.add_argument("--window-mode", choices=("auto", "reprime", "slide"),
                   default="auto",
                   help="blocks past the model context: reference-style cache "
                        "rebuilds (reprime) or a ring-buffer cache with global "
                        "RoPE positions (slide: no re-prime work, full-window "
                        "context at every token — measured better on ratio AND "
                        "speed). auto = slide when the model supports it")
    c.add_argument("--slide-seg", type=int, default=None, metavar="S",
                   help="float slide-mode scan segment length (default: engine "
                        "default; 0 = legacy single-scan graphs; recorded in "
                        "the container)")
    c.add_argument("--w8", action="store_true",
                   help="int8 weights (W8A8 projections): halves per-step "
                        "weight HBM traffic — the dominant cost at 1B+ "
                        "scale (quantized forward changes the bitstream, "
                        "recorded in the container; combinable with --kv8)")
    c.add_argument("--kv8", action="store_true",
                   help="int8 KV cache: halves per-step attention HBM traffic "
                        "(float-path speed mode; quantized attention changes "
                        "the bitstream, recorded in the container)")
    c.add_argument("--det8", action="store_true",
                   help="topology-invariant LM forward (integer reductions): "
                        "bitstream identical on every mesh geometry")
    c.add_argument("--mesh-data", type=int, default=0,
                   help="device mesh data-parallel span (0 = no mesh / all remaining)")
    c.add_argument("--mesh-model", type=int, default=1,
                   help="device mesh tensor-parallel span (lm only)")
    c.set_defaults(fn=_cmd_compress)

    d = sub.add_parser("decompress", help="decompress a .lac container")
    d.add_argument("file")
    d.add_argument("-o", "--output")
    d.set_defaults(fn=_cmd_decompress)

    i = sub.add_parser("info", help="show container metadata")
    i.add_argument("file")
    i.set_defaults(fn=_cmd_info)

    v = sub.add_parser("verify", help="check per-block checksums of a .lac container")
    v.add_argument("file")
    v.set_defaults(fn=_cmd_verify)

    r = sub.add_parser("recover",
                       help="decode the good prefix of a truncated/corrupt container")
    r.add_argument("file")
    r.add_argument("-o", "--output")
    r.set_defaults(fn=_cmd_recover)

    t = sub.add_parser("train", help="train a byte LM on FILE for the lm coding path")
    t.add_argument("file")
    t.add_argument("-o", "--output", default="byte_lm.npz")
    t.add_argument("--preset", default="byte-6l")
    t.add_argument("--steps", type=int, default=2000)
    t.add_argument("--batch", type=int, default=32)
    t.add_argument("--seq", type=int, default=256)
    t.add_argument("--lr", type=float, default=3e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--init", default=None, metavar="CKPT",
                   help="warm-start from an existing checkpoint "
                        "(continuation/fine-tune; preset must match)")
    t.set_defaults(fn=_cmd_train)

    b = sub.add_parser("bench", help="round-trip benchmark on FILE")
    b.add_argument("file")
    b.add_argument("--model", default="order0n")
    b.add_argument("--block-size", type=int, default=1 << 12)
    b.add_argument("--prob-bits", type=int, default=16)
    b.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
