"""Rebuild the contamination-guarded python-source training corpus.

Held-out split (MUST match bench.py exactly): every 13th file of the sorted
recursive glob of /usr/lib/python3.11/**/*.py. Training corpus = the other
stdlib files + all site-packages .py files whose content sha256 is NOT the
hash of any held-out file (guards against vendored stdlib copies).

Outputs:
  scratch/corpus_train.bin  (~500 MB)
  scratch/corpus_eval.bin   (held-out concatenation, for train-time eval)

This is how the shipped checkpoints' corpora are produced (the working VM is
reset between build rounds, so the recipe lives here, committed, not in
scratch/). Reference analog: llama_compress.py:4 consumes a pretrained
llama.cpp checkpoint; this framework trains its own predictors in-repo.
"""
import glob
import hashlib
import os

STDLIB = "/usr/lib/python3.11"
SITEPKGS = [
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/lib/python3/dist-packages",
]


def main():
    files = sorted(glob.glob(STDLIB + "/**/*.py", recursive=True))
    held = [f for i, f in enumerate(files) if i % 13 == 0]
    train_std = [f for i, f in enumerate(files) if i % 13 != 0]

    held_blobs = [open(f, "rb").read() for f in held]
    held_hashes = {hashlib.sha256(b).digest() for b in held_blobs}

    n_skip = 0
    with open("scratch/corpus_train.bin", "wb") as out:
        for f in train_std:
            out.write(open(f, "rb").read())
        for root in SITEPKGS:
            for f in sorted(glob.glob(root + "/**/*.py", recursive=True)):
                b = open(f, "rb").read()
                if hashlib.sha256(b).digest() in held_hashes:
                    n_skip += 1
                    continue
                out.write(b)
    with open("scratch/corpus_eval.bin", "wb") as out:
        for b in held_blobs:
            out.write(b)
    print(
        f"train: {os.path.getsize('scratch/corpus_train.bin')/1e6:.1f} MB "
        f"({len(train_std)} stdlib files + site-packages, {n_skip} hash-skipped)\n"
        f"eval:  {os.path.getsize('scratch/corpus_eval.bin')/1e6:.1f} MB "
        f"({len(held)} held-out files)"
    )


if __name__ == "__main__":
    main()
