"""Materialize a stock-format LibriSpeech-layout FLAC corpus on disk.

The reference consumes the upstream FLAC LibriSpeech distribution out of
the box (reference: src/training_utils/build.py:118-133). This tool
produces a tree with the same layout — ``split/speaker/chapter/
<spk>-<chap>-<utt>.flac`` plus ``<spk>-<chap>.trans.txt`` — from the
deterministic synthetic corpus, encoded as real 16-bit FLAC
(paa_tpu/data/flac.py:encode_flac, decodable by any compliant decoder).

Purpose: end-to-end runs of the EXACT stock-corpus ingestion path
(tree walk → FLAC decode → quantile filter → collate → attack) without
network access. Used by tests/test_flac.py's end-to-end test and by:

    python tools/make_librispeech_flac.py --out /tmp/ls_flac --num 96
    python -m paa_tpu.cli.run_attack --dataset LibreeSpeech \
        --data_root /tmp/ls_flac ...
"""

from __future__ import annotations

import argparse
import os
import sys

if __name__ == "__main__":  # runnable from a checkout without installing
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(
    out_root: str,
    num_utterances: int = 96,
    seed: int = 5,
    sr: int = 16000,
    split: str = "test-clean",
    utterances_per_chapter: int = 8,
    min_words: int = 3,
    max_words: int = 8,
) -> int:
    """Write the tree; returns the number of utterances written."""
    from paa_tpu.data import flac, synthetic

    samples = synthetic.generate_corpus(
        num_samples=num_utterances, sr=sr, seed=seed,
        min_words=min_words, max_words=max_words,
    )
    written = 0
    chapter_lines: list[str] = []
    chapter_dir = ""
    spk = chap = 0
    for i, (wav, wav_sr, text) in enumerate(samples):
        if i % utterances_per_chapter == 0:
            if chapter_lines:
                with open(
                    os.path.join(chapter_dir, f"{spk}-{chap}.trans.txt"), "w"
                ) as f:
                    f.write("\n".join(chapter_lines) + "\n")
                chapter_lines = []
            spk = 100 + i // (2 * utterances_per_chapter)
            chap = 1000 + (i // utterances_per_chapter) % 2
            chapter_dir = os.path.join(out_root, split, str(spk), str(chap))
            os.makedirs(chapter_dir, exist_ok=True)
        utt = f"{spk}-{chap}-{i % utterances_per_chapter:04d}"
        flac.write_flac(os.path.join(chapter_dir, utt + ".flac"), wav, wav_sr)
        chapter_lines.append(f"{utt} {text.upper()}")
        written += 1
    if chapter_lines:
        with open(os.path.join(chapter_dir, f"{spk}-{chap}.trans.txt"), "w") as f:
            f.write("\n".join(chapter_lines) + "\n")
    return written


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True, help="corpus root to create")
    ap.add_argument("--num", type=int, default=96)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--split", default="test-clean")
    args = ap.parse_args()
    n = build_corpus(args.out, args.num, args.seed, args.sr, args.split)
    print(f"wrote {n} FLAC utterances under {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
