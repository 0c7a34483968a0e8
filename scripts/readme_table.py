"""Generate the README "Measured performance" table from BENCH_FULL*.jsonl.

Single source of truth for the README perf numbers (VERDICT r4 weak #6: the
README, BENCHMARKING.md close-out, and BENCH_FULL artifacts drifted by
rounding for three rounds).  The table lives between the markers

    <!-- BENCH_TABLE_START --> ... <!-- BENCH_TABLE_END -->

in README.md and is rewritten verbatim from the committed artifacts:

    python scripts/readme_table.py          # rewrite README.md in place
    python scripts/readme_table.py --check  # exit 1 if README is stale

`--check` runs in the test suite (tests/test_readme_table.py) so a
regenerated BENCH_FULL without a regenerated README fails CI.
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric -> (README row label, reference column text, reference sec/batch)
ROWS = [
    ("tf_train_frozen_encoder",
     "TF train step, frozen encoder (bs=32)", "~0.172 s/batch"),
    ("tf_train_finetune_5",
     "TF train step, fine-tuning layers 5-7", "~0.42 s/batch"),
    ("tf_train_lstm_attention",
     "LSTM+attention TF train step", "~0.212 s/batch"),
    ("greedy_rollout_eval",
     "free-running greedy eval (51 decode steps, worst case: no row finishes)",
     "~0.73 s/batch"),
]
BEAM_ROWS = [
    ("beam5_captions_per_sec", "beam-5 captioning (batch 32, transformer)"),
    ("beam5_lstm_captions_per_sec", "beam-5 captioning (batch 32, LSTM)"),
]


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                r = json.loads(line)
                rows[r["metric"]] = r
    return rows


def imgs_per_sec(sec):
    return 32.0 / sec


def build_table(f32, bf16):
    lines = [
        "| metric | this framework | MFU | reference (BASELINE.md) | speedup |",
        "|---|---|---|---|---|",
    ]
    for metric, label, ref_text in ROWS:
        a, b = f32.get(metric), bf16.get(metric)
        if a is None:
            continue
        val = f"{a['value']:.4f} s/batch"
        if metric == "tf_train_frozen_encoder":
            val += f" ({imgs_per_sec(a['value']):.0f} imgs/s/chip"
            val += f"; bf16: {b['value']:.4f})" if b else ")"
        elif b:
            val += f" (bf16: {b['value']:.4f})"
        mfu_txt = "—"
        if a.get("mfu") is not None:
            mfu_txt = f"{100 * a['mfu']:.1f}%"
            if b and b.get("mfu") is not None:
                mfu_txt += f" (bf16 **{100 * b['mfu']:.1f}%**)"
        speedup = f"**{a['vs_baseline']:.1f}x**"
        lines.append(f"| {label} | {val} | {mfu_txt} | {ref_text} | {speedup} |")
    for metric, label in BEAM_ROWS:
        a, b = f32.get(metric), bf16.get(metric)
        if a is None:
            continue
        val = f"{a['value']:.1f} captions/s"
        if b:
            val += f" (bf16: {b['value']:.1f})"
        src = a.get("baseline_source", "")
        ref_caps = a["value"] / a["vs_baseline"]
        ref_text = f"{ref_caps:.3f} captions/s ({src})"
        speedup = f"**~{a['vs_baseline']:.0f}x**"
        lines.append(f"| {label} | {val} | — | {ref_text} | {speedup} |")
    return "\n".join(lines)


START, END = "<!-- BENCH_TABLE_START -->", "<!-- BENCH_TABLE_END -->"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README.md is stale instead of rewriting")
    args = ap.parse_args()

    f32 = load(os.path.join(ROOT, "BENCH_FULL.jsonl"))
    bf16_path = os.path.join(ROOT, "BENCH_FULL_bfloat16.jsonl")
    bf16 = load(bf16_path) if os.path.exists(bf16_path) else {}
    table = build_table(f32, bf16)

    readme_path = os.path.join(ROOT, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    if START not in readme or END not in readme:
        sys.exit(f"README.md is missing the {START} / {END} markers")
    head, rest = readme.split(START, 1)
    _, tail = rest.split(END, 1)
    updated = f"{head}{START}\n{table}\n{END}{tail}"

    if args.check:
        if updated != readme:
            print("README.md perf table is stale — run "
                  "`python scripts/readme_table.py`", file=sys.stderr)
            sys.exit(1)
        print("README table matches BENCH_FULL*.jsonl")
        return
    if updated != readme:
        with open(readme_path, "w") as f:
            f.write(updated)
        print("README.md table rewritten from BENCH_FULL*.jsonl")
    else:
        print("README.md already up to date")


if __name__ == "__main__":
    main()
