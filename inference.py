"""Per-video evaluation CLI (reference /root/reference/inference.py).

Loads a training run's ``setting.yaml`` + saved weights, packs every
clip_duration-second clip of every test video, scores them through
``Detector.predict`` in fixed-size padded batches (static XLA shapes), and
ensembles per-video by averaging clip softmax probabilities
(``--modality video``) or scores per clip (``clip``). Emits
``report_<ts>_<mode>_<modality>.json`` and ``stats_*.pickle`` and injects the
reference's [0,1] sentinel batch into both calculators before compute
(reference inference.py:159-160).
"""

import argparse
import json
import logging
import pickle
import warnings
from collections import deque
from datetime import datetime
from os import path

import jax
import numpy as np

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.data import FFPP, CDF, DFDC
from dfd_clip_tpu.data.loader import DataLoader
from dfd_clip_tpu.models import Detector
from dfd_clip_tpu.models import weights as weights_lib
from dfd_clip_tpu.runtime import MeshRuntime
from dfd_clip_tpu.utils import metrics as metrics_lib
from dfd_clip_tpu.utils.notify import send_to_telegram

REGISTRY = {"FFPP": FFPP, "CDF": CDF, "DFDC": DFDC}


def get_config(cfg_file, args):
    import yaml

    with open(cfg_file) as f:
        preset = CN(yaml.safe_load(f), new_allowed=True)

    C = CN(new_allowed=True)
    # Deepfake task index via the SAME first-appearance-of-data.train rule
    # that assigned indices at training time (main.category_index_map). The
    # reference instead takes the Deepfake entry's POSITION in data.eval
    # (inference.py:29) — wrong whenever eval order differs from the task
    # order (e.g. an eval list without the rPPG set). Fall back to the
    # reference rule only for setting files without a data.train section.
    try:
        cats = list(dict.fromkeys(d.category for d in preset.data.train))
        C.target_task = cats.index("Deepfake")
    except (AttributeError, KeyError, ValueError):
        C.target_task = next(
            i for i, d in enumerate(preset.data.eval) if d.category == "Deepfake"
        )

    aux = None
    if args.aux_file:
        with open(args.aux_file) as f:
            aux = CN(yaml.safe_load(f), new_allowed=True)

    C.data = CN()
    C.data.num_frames = preset.data.num_frames
    C.data.clip_duration = preset.data.clip_duration
    C.data.datasets = [
        REGISTRY[d.name].get_default_config().merge_from_other_cfg(d)
        for d in list(preset.data.eval) + (list(aux.data.eval) if aux else [])
        if d.category == "Deepfake"
    ]
    for cfg in C.data.datasets:
        cfg.scale = 0.1 if args.test else 1.0

    C.model = Detector.get_default_config().merge_from_other_cfg(preset.model)
    C.freeze()
    return C


def load_model_params(model, root, weight_mode):
    """init params, then overlay the checkpoint's trainable subtree."""
    params = model.init_params(jax.random.key(0),
                               encoder_params=getattr(model, "pretrained_encoder", None))
    state = weights_lib.load_params(path.join(root, f"{weight_mode}_weights.pt"))
    trainable = state["trainable"] if isinstance(state, dict) and "trainable" in state else state
    params.update(jax.tree_util.tree_map(lambda x: x, trainable))
    if isinstance(state, dict) and "frozen" in state:
        params.update(state["frozen"])
    # inference-only prep (e.g. pre-quantized int8 tower weights under
    # op_mode.compute_int8) — runtime state, never saved
    if hasattr(model, "prepare_params"):
        params = model.prepare_params(params)
    return params


def main(args):
    root = args.artifacts_dir
    cfg_file = path.join(root, f"{args.cfg_name}.yaml")
    if not path.isfile(cfg_file):
        raise SystemExit(
            f"no {args.cfg_name}.yaml in {root} — pass a training run directory "
            "(or --cfg_name for a differently named config)"
        )
    weights = path.join(root, f"{args.weight_mode}_weights.pt")
    if not path.isfile(weights):
        raise SystemExit(
            f"no {args.weight_mode}_weights.pt in {root} "
            "(--weight_mode best|last)"
        )
    config = get_config(cfg_file, args)
    runtime = MeshRuntime()

    report = {}
    stats = {}

    model = Detector(config.model, config.data.num_frames)
    from main import load_pretrained_encoder

    wrapper = CN(new_allowed=True)
    wrapper.model = config.model
    load_pretrained_encoder(model, wrapper)
    params = runtime.replicate(load_model_params(model, root, args.weight_mode))

    N = args.batch_size
    predict_fn = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][config.target_task])

    for ds_cfg in config.data.datasets:
        ds_cfg.defrost()
        ds_cfg.pack = 1
        test_dataset = REGISTRY[ds_cfg.name](
            ds_cfg, config.data.num_frames, config.data.clip_duration,
            runtime=runtime, split="test", index=config.target_task,
        )
        # Unique report/stats key: a second entry of the same dataset class
        # (e.g. two CDF roots via --aux_file) must not overwrite the first's
        # accumulated stats and report row. Single-instance runs keep the
        # reference's class-name keys verbatim.
        ds_key = ds_cfg.name
        n_dup = 2
        while ds_key in stats:
            ds_key = f"{ds_cfg.name}#{n_dup}"
            n_dup += 1
        stats[ds_key] = {"label": [], "prob": []}
        # rank-strided video shard: each process scores its own slice and the
        # results are assembled once at the end (ragged-safe gather)
        loader = DataLoader(test_dataset, batch_size=1,
                            num_workers=args.num_workers, collate_fn=lambda b: b[0],
                            num_shards=runtime.num_processes,
                            shard_index=runtime.process_index)
        logging.info("Dataset %s initialized with %d samples",
                     type(test_dataset).__name__, len(test_dataset))

        accuracy_calc = metrics_lib.accuracy()
        roc_auc_calc = metrics_lib.roc_auc()

        def sub_batches():
            """(clips, label, clip-batch...) stream with static-shape padding."""
            for i, data in enumerate(loader):
                clips, label, masks = data[0], data[1], data[2]
                if isinstance(clips, list) and len(clips) == 0:
                    logging.error("Sample Index: %d has no clips, skipping...", i)
                    continue
                clips = np.stack(clips)
                masks = np.stack(masks)
                parts = []
                for j in range(0, len(clips), N):
                    x = clips[j : j + N]
                    m = masks[j : j + N]
                    n_valid = x.shape[0]
                    if n_valid < N:  # pad to the static batch shape
                        x = np.concatenate([x, np.repeat(x[-1:], N - n_valid, 0)])
                        m = np.concatenate([m, np.repeat(m[-1:], N - n_valid, 0)])
                    parts.append((x, m, n_valid))
                yield label, parts

        from dfd_clip_tpu.utils.device import prefetch_iter

        def place(item):
            label, parts = item
            return label, [(jax.device_put(x), jax.device_put(m), nv)
                           for x, m, nv in parts]

        local_probs, local_labels = [], []

        def drain(label, outs):
            logits = np.concatenate([np.asarray(o)[:nv] for o, nv in outs])
            p = _softmax(logits)

            if args.modality == "clip":
                local_probs.append(p)
                local_labels.append(np.asarray(label))
            elif args.modality == "video":
                local_probs.append(p.mean(0, keepdims=True))
                local_labels.append(np.asarray([label[0]]))
            else:
                raise NotImplementedError(args.modality)

        # Bounded dispatch pipeline: keep a few videos' predictions in
        # flight and materialize the oldest, so the device never idles on
        # the host's per-batch sync (device logits are (N, out_dim) — tiny).
        pending: "deque" = deque()
        for label, parts in prefetch_iter(sub_batches(), place):
            outs = [(predict_fn(params, xd, md), nv) for xd, md, nv in parts]
            pending.append((label, outs))
            if len(pending) >= 3:
                drain(*pending.popleft())
        while pending:
            drain(*pending.popleft())

        # one ragged-safe gather for the whole shard (per-rank video counts
        # and clip counts differ; per-video collectives would deadlock)
        pred_prob, labels = runtime.gather_ragged((
            np.concatenate(local_probs) if local_probs
            else np.zeros((0, 2), np.float32),
            np.concatenate(local_labels) if local_labels
            else np.zeros((0,), np.int64),
        ))
        pred_label = pred_prob.argmax(-1)
        stats[ds_key]["label"] += labels.tolist()
        stats[ds_key]["prob"] += pred_prob[:, 1].tolist()

        if runtime.is_main_process:
            accuracy_calc.add_batch(pred_label, pred_prob, labels)
            roc_auc_calc.add_batch(pred_label, pred_prob, labels)

        if runtime.is_main_process:
            # sentinel batch (reference inference.py:159-160)
            accuracy_calc.add_batch(np.array([0, 1]), None, np.array([0, 1]))
            roc_auc_calc.add_batch(None, np.array([[1.0, 0.0], [0.0, 1.0]]), np.array([0, 1]))
            accuracy = round(accuracy_calc.compute()["accuracy"], 3)
            roc_auc = round(roc_auc_calc.compute()["roc_auc"], 3)
            logging.info("accuracy: %s, roc_auc: %s", accuracy, roc_auc)
            report[ds_key] = {
                "accuracy": accuracy,
                "roc_auc": roc_auc,
            }

    if runtime.is_main_process:
        timestamp = datetime.now().strftime("%m%dT%H%M")
        with open(path.join(root, f"report_{timestamp}_{args.weight_mode}_{args.modality}.json"), "w") as f:
            json.dump(report, f, sort_keys=True, indent=4, separators=(",", ": "))
        with open(path.join(root, f"stats_{timestamp}_{args.weight_mode}_{args.modality}.pickle"), "wb") as f:
            pickle.dump(stats, f)

        send_to_telegram(f"Inference for '{root.split('/')[-1]}' Complete!")
        send_to_telegram(json.dumps(report, sort_keys=True, indent=4, separators=(",", ": ")))
    return report


def _softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


if __name__ == "__main__":
    warnings.filterwarnings(action="ignore")
    logging.basicConfig(level="INFO")
    parser = argparse.ArgumentParser(description="Deepfake detector with foundation models (TPU).")
    parser.add_argument("artifacts_dir", type=str, help="Directory with model artifacts")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--aux_file", type=str, default=None)
    parser.add_argument("--weight_mode", type=str, default="best")
    parser.add_argument("--modality", type=str, default="video")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--cfg_name", type=str, default="setting")
    main(parser.parse_args())
