"""Chip compile regression for every bench.py rung configuration.

Round-3 postmortem (VERDICT weak #2): all mega* int8 rungs and both train
megakernel rungs died on driver day with `remote_compile HTTP 500:
tpu_compile_helper exit 1` — the session-10 Mosaic tile-alignment fix had
been described in PERF.md but never committed, so the driver ran the pre-fix
kernel. This tool makes "compiles and runs on chip" a regression instead of
a claim: it compiles AND executes one batch of every composition bench.py
measures, at bench.py's exact geometry and knob sets (imported from bench,
not copied), and exits non-zero if any rung fails.

Usage:
  python tools/chip_compile_check.py            # all rungs on the real chip
  python tools/chip_compile_check.py --fast     # predict rungs only
  JAX_PLATFORMS=cpu python tools/chip_compile_check.py   # interpret smoke

Run it before any driver day / after touching ops/pallas_*.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# the axon plugin ignores the JAX_PLATFORMS env var (CLAUDE.md gotcha)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import bench  # noqa: E402  (the rung configs under test)

KNOBS = ("DFD_MEGAKERNEL", "DFD_INT8_ATTN")


def _clear():
    for k in KNOBS:
        os.environ.pop(k, None)


def check_predict_rungs(results: list) -> None:
    """One compiled + executed batch per INT8_AB rung (bench geometry)."""
    model, params = bench._build_model()
    imodel = bench.build_int8_model()
    iparams = imodel.prepare_params(params)
    x = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (bench.BATCH_CLIPS, bench.NUM_FRAMES, 3, bench.RES,
                 bench.RES), np.uint8))
    m = jax.device_put(np.ones((bench.BATCH_CLIPS, bench.NUM_FRAMES), bool))

    # the bf16 default path (bench's headline device-only rung)
    def run(tag, mdl, p):
        t0 = time.perf_counter()
        try:
            out = jax.jit(lambda p, x, m: mdl.predict(p, x, m)[0][0])(p, x, m)
            np.asarray(out)  # block_until_ready is a no-op on axon
            results.append((tag, "OK", time.perf_counter() - t0, ""))
        except Exception as e:  # noqa: BLE001 — each rung reports itself
            results.append((tag, "FAIL", time.perf_counter() - t0,
                            f"{type(e).__name__}: {str(e)[:200]}"))

    _clear()
    run("predict bf16 default", model, params)
    for tag, knobs in bench.INT8_AB:
        _clear()
        os.environ.update(knobs)
        run(f"predict int8 {tag}", imodel, iparams)
    _clear()


def check_train_rungs(results: list) -> None:
    """One executed train step per bench_train_step composition."""
    import optax

    from dfd_clip_tpu.engine import optim as optim_lib
    from dfd_clip_tpu.models.detector import Detector

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "12"))
    x = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (batch, bench.NUM_FRAMES, 3, bench.RES, bench.RES),
        np.uint8))
    y = jax.device_put((np.arange(batch) % 2).astype(np.int32))
    m = jax.device_put(np.ones((batch, bench.NUM_FRAMES), bool))
    rng = jax.random.key(1)

    def one_step(tag, op_mode, knobs):
        _clear()
        os.environ.update(knobs)
        t0 = time.perf_counter()
        try:
            mdl = Detector(bench._detector_cfg(op_mode, dropout=0.5),
                           num_frames=bench.NUM_FRAMES)
            params = mdl.init_params(jax.random.key(0))
            trainable, frozen = mdl.partition_params(params)
            # int8 rungs: pre-quantized wq/ws sidecar leaves, exactly the
            # composition bench.bench_train_step / Trainer.frozen_run runs
            frozen = mdl.prepare_params(frozen)
            optimizer = optim_lib.build_optimizer(
                mdl.optimizer_spec(), optim_lib.one_cycle_schedule(2.5e-3, 30))

            # frozen MUST be a jit argument, not a closure: closed-over
            # weights become HLO constants (~340 MB) and blow the axon
            # remote-compile body limit (HTTP 413). bench.py passes them
            # as args; the checker must match or it tests a different graph.
            def train_step(tr, fz, opt_state, x, y, m):
                def loss_fn(tr):
                    task_losses, _, other = mdl.forward(
                        {**fz, **tr}, x, [y], m, train=True,
                        single_task=0, rng=rng)
                    return task_losses[0].mean() + sum(
                        v.mean() for v in other.values())

                loss, grads = jax.value_and_grad(loss_fn)(tr)
                updates, opt_state = optimizer.update(grads, opt_state, tr)
                return optax.apply_updates(tr, updates), opt_state, loss

            st = optimizer.init(trainable)
            frozen = jax.device_put(frozen)
            _, _, loss = jax.jit(train_step)(trainable, frozen, st, x, y, m)
            float(loss)
            results.append((tag, "OK", time.perf_counter() - t0, ""))
        except Exception as e:  # noqa: BLE001
            results.append((tag, "FAIL", time.perf_counter() - t0,
                            f"{type(e).__name__}: {str(e)[:200]}"))

    one_step("train bf16 blocks", None, {"DFD_MEGAKERNEL": "0"})
    one_step("train bf16 mega", None, {"DFD_MEGAKERNEL": "1"})
    one_step("train int8 blocks", {"compute_int8": 1}, {"DFD_MEGAKERNEL": "0"})
    one_step("train int8 mega", {"compute_int8": 1}, {"DFD_MEGAKERNEL": "1"})
    _clear()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="predict rungs only (skip the train-step rungs)")
    args = ap.parse_args(argv)

    print(f"backend={jax.default_backend()} batch={bench.BATCH_CLIPS}",
          flush=True)
    results: list = []
    check_predict_rungs(results)
    if not args.fast:
        check_train_rungs(results)

    failed = 0
    for tag, status, dt, err in results:
        line = f"{tag:26s} {status:4s} {dt:7.1f}s"
        if err:
            line += f"  {err}"
            failed += 1
        print(line, flush=True)
    print(f"{len(results) - failed}/{len(results)} rungs OK", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
