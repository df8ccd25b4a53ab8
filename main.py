"""Training CLI.

Mirrors the reference's entry point surface (/root/reference/main.py):
``python main.py --cfg configs/deepfake/deepfake.yaml [--debug] [--test]``
with the same YAML schema, class-name-reflection config defaults
(main.py:28-110), run-dir versioning, setting.yaml persistence, and
callback registration — on top of the TPU MeshRuntime instead of Accelerate.
"""

import argparse
import logging
import os
import re
import warnings
from datetime import datetime, timedelta

import jax

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.data import FFPP, CDF, DFDC, RPPG
from dfd_clip_tpu.engine import Trainer, CompInvTrainer, Evaluator, CompInvEvaluator
from dfd_clip_tpu.engine.callbacks import (
    cache_best_model, compute_metrics, end_timer, init_metrics, start_timer,
    update_metrics, update_trackers,
)
from dfd_clip_tpu.models import Detector, CompInvEncoder
from dfd_clip_tpu.models import weights as weights_lib
from dfd_clip_tpu.runtime import MeshRuntime
from dfd_clip_tpu.runtime.mesh import initialize_multihost
from dfd_clip_tpu.utils.notify import send_to_telegram
from dfd_clip_tpu.utils.tracking import Tracker

PROJECT_DIR = None

# class-name reflection registry (reference uses globals(); main.py:71-97)
REGISTRY = {
    "Detector": Detector,
    "CompInvEncoder": CompInvEncoder,
    "Trainer": Trainer,
    "CompInvTrainer": CompInvTrainer,
    "Evaluator": Evaluator,
    "CompInvEvaluator": CompInvEvaluator,
    "FFPP": FFPP,
    "CDF": CDF,
    "DFDC": DFDC,
    "RPPG": RPPG,
}


def get_config(params):
    C = CN()

    # system
    C.system = CN()
    C.system.mixed_precision = "bf16"  # no | bf16 (fp16 maps to bf16 on TPU)
    C.system.seed = 0
    C.system.deterministic_training = False
    C.system.training_eval_interval = 10
    C.system.evaluation_interval = 10
    C.system.seq_parallel = 1
    C.system.profile_steps = []  # [start, end) jax.profiler trace window

    # tracking
    C.tracking = CN()
    C.tracking.enabled = False
    C.tracking.directory = "logs"
    C.tracking.project_name = None
    C.tracking.default_project_prefix = "version"
    C.tracking.tool = "wandb"
    C.tracking.main_metric = "deepfake/ffpp/roc_auc"
    C.tracking.compare_fn = "max"

    C.model = CN(new_allowed=True)
    C.trainer = CN(new_allowed=True)
    C.evaluator = CN(new_allowed=True)

    C.data = CN()
    C.data.num_frames = 50
    C.data.clip_duration = 10
    C.data.train = []
    C.data.eval = []

    if params.cfg is not None:
        if not os.path.isfile(params.cfg):
            raise SystemExit(f"config file not found: {params.cfg}")
        C.merge_from_file(params.cfg)
        C.model = REGISTRY[C.model.name].get_default_config().merge_from_other_cfg(C.model)
        C.trainer = REGISTRY[C.trainer.name].get_default_config().merge_from_other_cfg(C.trainer)
        C.evaluator = REGISTRY[C.evaluator.name].get_default_config().merge_from_other_cfg(C.evaluator)
        C.data.train = [
            REGISTRY[d.name].get_default_config().merge_from_other_cfg(d)
            for d in C.data.train
        ]
        C.data.eval = [
            REGISTRY[d.name].get_default_config().merge_from_other_cfg(d)
            for d in C.data.eval
        ]

    if params.test:
        C.tracking.directory = "logs"
        C.tracking.project_name = "test"

    C.freeze()
    for d_eval in C.data.eval:
        assert "name" in d_eval
    return C


def register_trainer_callbacks(config, trainer, **kwargs):
    def evaluation_proxy(trainer):
        if trainer.steps % trainer.evaluation_interval:
            return
        kwargs["evaluator"].run(trainer)

    def save_model(trainer):
        evaluator = kwargs["evaluator"]
        if getattr(evaluator, "best_model_state", None):
            weights_lib.save_params(
                os.path.join(PROJECT_DIR, "best_weights.pt"), evaluator.best_model_state
            )
        # Always persist final weights: the reference writes nothing at all
        # when no evaluation ever ran (evaluation_interval > max_steps).
        last = getattr(evaluator, "last_model_state", None) or trainer.snapshot_model_state()
        weights_lib.save_params(os.path.join(PROJECT_DIR, "last_weights.pt"), last)
        if not getattr(evaluator, "best_model_state", None):
            weights_lib.save_params(os.path.join(PROJECT_DIR, "best_weights.pt"), last)

    timer_events = ["training", "epoch", "batch"]
    trainer.add_callback("on_training_start", lambda _: None,
                         timer={evt: 0 for evt in timer_events})
    for event in timer_events:
        trainer.add_callback(f"on_{event}_start", start_timer)
        trainer.add_callback(f"on_{event}_end", end_timer)

    trainer.add_callback("on_batch_end", update_metrics)
    if trainer.runtime.is_main_process:
        trainer.add_callback("on_training_start", init_metrics)
        trainer.add_callback("on_batch_end", compute_metrics,
                             training_eval_interval=config.system.training_eval_interval)

    if config.tracking.enabled and trainer.runtime.is_main_process:
        trainer.add_callback("on_batch_end", update_trackers)
        trainer.add_callback("on_training_end", save_model)

    trainer.add_callback(
        "on_batch_end",
        lambda t: t.runtime.print(
            f"{t.steps} | loss {t.batch_loss_info}, {t.batch_duration:.2f}s"
        ),
    )
    trainer.add_callback(
        "on_training_end",
        lambda t: t.runtime.print(
            f"training completed in {timedelta(seconds=t.training_duration)}"
        ),
    )

    trainer.add_callback("on_batch_end", evaluation_proxy,
                         evaluation_interval=config.system.evaluation_interval)


def register_evaluator_callbacks(config, evaluator, **kwargs):
    def clear_current_main_metrics(evaluator):
        evaluator.current_main_metrics = []

    timer_events = ["evaluation", "dataloader"]
    evaluator.add_callback("on_evaluation_start", lambda _: None,
                           timer={evt: 0 for evt in timer_events})
    evaluator.add_callback("on_evaluation_start",
                           lambda e: e.runtime.print("evaluation start"))
    for event in timer_events:
        evaluator.add_callback(f"on_{event}_start", start_timer)
        evaluator.add_callback(f"on_{event}_end", end_timer)

    evaluator.add_callback("on_batch_end", update_metrics)
    if evaluator.runtime.is_main_process:
        evaluator.add_callback("on_evaluation_start", init_metrics)
        evaluator.add_callback("on_evaluation_end", compute_metrics,
                               training_eval_interval=1)

    if config.tracking.enabled and evaluator.runtime.is_main_process:
        evaluator.add_callback("on_evaluation_end", update_trackers)
        evaluator.add_callback("on_evaluation_start", clear_current_main_metrics,
                               main_metric=config.tracking.main_metric,
                               compare_fn=config.tracking.compare_fn,
                               current_main_metrics=[])
        evaluator.add_callback("on_evaluation_end", cache_best_model,
                               best_model_state=None, last_model_state=None)

    evaluator.add_callback(
        "on_batch_end",
        lambda e: e.runtime.print(f"{e.steps}.{e.batch_num} | loss {e.batch_loss_info}"),
    )
    evaluator.add_callback(
        "on_evaluation_end",
        lambda e: e.runtime.print(f"evaluation completed in {e.evaluation_duration:.2f}"),
    )


def resolve_compute_dtype(mixed_precision: str):
    import jax.numpy as jnp

    if mixed_precision in ("bf16", "fp16"):
        return jnp.bfloat16
    return jnp.float32


def load_pretrained_encoder(model, config):
    """Load converted foundation weights if a checkpoint is available."""
    candidates = []
    if "pretrained" in config.model and config.model.pretrained:
        candidates.append(config.model.pretrained)
    if config.model.foundation == "clip":
        name = config.model.architecture.replace("/", "-").replace("@", "-")
        candidates += [f"misc/{name}.pt", f"misc/{name}.npz"]
    elif config.model.foundation == "farl":
        candidates += ["misc/FaRL-Base-Patch16-LAIONFace20M-ep64.pth",
                       "misc/farl.pth"]
    elif config.model.foundation == "dinov2":
        candidates += ["misc/dinov2_vitb14_pretrain.pth"]
    for c in candidates:
        if os.path.isfile(c):
            params = None
            try:
                # framework-native checkpoint (e.g. ssl_train.py's
                # teacher_backbone.pt) — a pickled numpy pytree
                state = weights_lib.load_params(c)
                if isinstance(state, dict):
                    tree = state.get("backbone", state)
                    if isinstance(tree, dict) and "blocks" in tree:
                        params = jax.tree_util.tree_map(lambda x: x, tree)
            except Exception:
                params = None
            if params is None:
                if config.model.foundation in ("clip", "farl"):
                    params, _ = weights_lib.load_clip_visual(c)
                else:
                    params = weights_lib.load_dinov2(c, model.vit_cfg)
            model.pretrained_encoder = params
            logging.info("Loaded pretrained encoder weights from %s", c)
            return
    logging.warning(
        "No pretrained encoder checkpoint found (%s); using random init. "
        "Place converted weights under misc/ for real runs.", candidates
    )


def init_runtime(config):
    global PROJECT_DIR
    initialize_multihost()
    runtime = MeshRuntime(seq_parallel=config.system.seq_parallel)

    project_name = config.tracking.default_project_prefix
    tracking_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 config.tracking.directory)
    if config.tracking.project_name is None:
        version = 0
        while os.path.isdir(os.path.join(tracking_root, f"{project_name}_{version}")):
            version += 1
        project_name = f"{project_name}_{version}"
        PROJECT_DIR = os.path.join(tracking_root, project_name)
    else:
        project_name = re.sub("/", "_", config.tracking.project_name)
        PROJECT_DIR = os.path.join(tracking_root, project_name,
                                   datetime.now().strftime("%m%dT%H%M"))

    # the version probe and minute-resolution timestamp are rank-dependent
    # (dir-listing races, minute boundaries): rank 0 decides, all follow
    PROJECT_DIR = runtime.broadcast_str(PROJECT_DIR)
    project_name = runtime.broadcast_str(project_name)

    os.makedirs(PROJECT_DIR, exist_ok=True)
    if runtime.is_main_process:
        with open(os.path.join(PROJECT_DIR, "setting.yaml"), "w") as f:
            f.write(config.dump())

    from dfd_clip_tpu.utils.logging import setup_logging

    setup_logging(PROJECT_DIR)  # per-rank log files; rank 0 also -> stdout
    tracker = Tracker(PROJECT_DIR, enabled=config.tracking.enabled, project=project_name)
    return runtime, tracker


def category_index_map(train_cfgs) -> dict:
    """Task index = FIRST-APPEARANCE order of categories in data.train, which
    is what the YAML's losses/out_dim ordering encodes (mix.yaml lists rPPG
    first and out_dim=[180, 2]). The reference uses ``enumerate(set(...))``
    (main.py:218-221) whose str-set order is hash-randomized per process — a
    genuine nondeterminism bug there; first-appearance is the intent."""
    return {
        cat: i
        for i, cat in enumerate(dict.fromkeys(cfg.category for cfg in train_cfgs))
    }


def main(params):
    global PROJECT_DIR
    config = get_config(params)
    runtime, tracker = init_runtime(config)
    runtime.print(config.dump())

    model = REGISTRY[config.model.name](
        config.model,
        num_frames=config.data.num_frames,
        compute_dtype=resolve_compute_dtype(config.system.mixed_precision),
    )
    load_pretrained_encoder(model, config)

    category_index = category_index_map(config.data.train)
    runtime.print("Task Indices:")
    for k, v in category_index.items():
        runtime.print(f"\t- {k} => {v}")

    train_datasets = [
        REGISTRY[cfg.name](
            cfg, config.data.num_frames, config.data.clip_duration,
            runtime=runtime, split="train",
            index=category_index[cfg.category], seed=config.system.seed,
        )
        for cfg in config.data.train
    ]
    for ds in train_datasets:
        runtime.print(
            f"Training Dataset {type(ds).__name__.upper()} initialized with {len(ds)} samples\n"
        )

    eval_datasets = [
        REGISTRY[cfg.name](
            cfg, config.data.num_frames, config.data.clip_duration,
            runtime=runtime, split="val",
            index=category_index.get(cfg.category, 0), seed=config.system.seed,
        )
        for cfg in config.data.eval
    ]
    for ds in eval_datasets:
        runtime.print(
            f"Evaluation Dataset {type(ds).__name__.upper()} initialized with {len(ds)} samples\n"
        )

    if config.trainer.get("checkpoint_interval", 0) and not config.trainer.get("checkpoint_dir", ""):
        config.trainer.defrost()
        config.trainer.checkpoint_dir = os.path.join(PROJECT_DIR, "checkpoints")
        config.trainer.freeze()
    trainer = REGISTRY[config.trainer.name](
        config.trainer, runtime, model, train_datasets,
        tracker=tracker, seed=config.system.seed,
    )
    evaluator = REGISTRY[config.evaluator.name](
        config.evaluator, runtime, eval_datasets, tracker=tracker
    )

    register_trainer_callbacks(config, trainer, evaluator=evaluator)
    register_evaluator_callbacks(config, evaluator)

    if config.system.profile_steps:
        from dfd_clip_tpu.engine.callbacks import make_profiler_callbacks

        start, end = config.system.profile_steps
        profile_cb = make_profiler_callbacks(
            os.path.join(PROJECT_DIR, "profile"), start, end
        )
        trainer.add_callback("on_batch_start", profile_cb)
        # flush a window that reaches the last step
        trainer.add_callback("on_training_end", profile_cb)

    trainer.run()

    if config.tracking.enabled:
        tracker.finish()
        # Rename the run dir to the wandb run name at completion, as the
        # reference does (main.py:272-277) — only when wandb actually ran.
        if tracker.run_name and trainer.runtime.is_main_process:
            wandb_dir = os.path.join(os.path.dirname(PROJECT_DIR), tracker.run_name)
            if not os.path.exists(wandb_dir):
                logging.info("Rename directory: %s -> %s", PROJECT_DIR, wandb_dir)
                os.rename(PROJECT_DIR, wandb_dir)
                PROJECT_DIR = wandb_dir
        send_to_telegram(f"Training Completed, Result Location: {PROJECT_DIR}")
    return PROJECT_DIR


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Deepfake detector with foundation models (TPU).")
    parser.add_argument("--cfg", type=str, default=None, help="YAML configuration file")
    parser.add_argument("--debug", action="store_true", help="Debugging Mode")
    parser.add_argument("--test", action="store_true", help="Testing Mode")
    params = parser.parse_args()

    if not params.debug:
        logging.basicConfig(level="INFO")
        warnings.filterwarnings(action="ignore")
    else:
        logging.basicConfig(level="DEBUG")

    main(params)
