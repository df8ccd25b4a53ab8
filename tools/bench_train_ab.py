"""Same-process A/B of train-step knobs (decoder custom VJP, megakernel).

The decoder custom VJP (ops/decoder_attention_vjp.py) swaps the train
step's decoder forward from the XLA composition to the Pallas kernel; this
tool measures the flagship train step (bench.bench_train_step envelope)
with it off/on in ONE process — the only comparison that survives ambient
tunnel drift (PERF.md).

Usage: python -u tools/bench_train_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_SKIP_TRAIN_INT8", "1")  # bf16 envelope A/B only

import bench  # noqa: E402


def main():
    for tag, knobs in (
        ("vjp off (XLA decoder fwd)", {"DFD_DEC_VJP": "0"}),
        ("vjp on (Pallas decoder fwd)", {"DFD_DEC_VJP": "1"}),
    ):
        os.environ.update(knobs)
        clips, steps, batch, _ = bench.bench_train_step()
        print(f"{tag:32s} {clips:8.2f} clips/s/chip  {steps:6.3f} steps/s "
              f"(batch {batch})", flush=True)


if __name__ == "__main__":
    main()
