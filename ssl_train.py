"""SSL (DINOv2-style) training CLI.

The working equivalent of the reference's dinov2 train entry
(dinov2/train/train.py:298-314 + dinov2/run/submit.py — which is not
runnable as vendored). Trains on an image folder (or synthetic data for
smoke runs):

  python ssl_train.py --data_dir /path/to/images --cfg configs/ssl/base.yaml
  python ssl_train.py --synthetic 1000 --steps 100      # smoke
"""

import argparse
import logging
import os
from glob import glob

import numpy as np

from dfd_clip_tpu.runtime import MeshRuntime
from dfd_clip_tpu.runtime.mesh import initialize_multihost
from dfd_clip_tpu.ssl import SSLTrainer
from dfd_clip_tpu.utils.tracking import Tracker


class ImageFolder:
    """Recursive image-folder dataset -> HWC uint8 RGB."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, root: str):
        self.paths = sorted(
            p for p in glob(os.path.join(root, "**", "*"), recursive=True)
            if p.lower().endswith(self.EXTS)
        )
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        import cv2

        img = cv2.imread(self.paths[i], cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"cannot read {self.paths[i]}")
        return img[..., ::-1]  # BGR -> RGB


class SyntheticImages:
    def __init__(self, n: int, size: int = 256):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return r.integers(0, 255, (self.size, self.size, 3), dtype=np.uint8)


def main():
    parser = argparse.ArgumentParser(description="DINOv2-style SSL pretraining (TPU)")
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="use N synthetic images instead of data_dir")
    parser.add_argument("--cfg", type=str, default=None, help="YAML overrides")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--arch", type=str, default=None)
    parser.add_argument("--out_dim", type=int, default=None)
    parser.add_argument("--local_size", type=int, default=None)
    parser.add_argument("--n_local_crops", type=int, default=None)
    parser.add_argument("--out_dir", type=str, default="logs/ssl")
    args = parser.parse_args()

    logging.basicConfig(level="INFO")
    initialize_multihost()
    runtime = MeshRuntime()

    cfg = SSLTrainer.get_default_config()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    if args.steps is not None:
        cfg.max_steps = args.steps
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    for name in ("arch", "out_dim", "local_size", "n_local_crops"):
        if getattr(args, name) is not None:
            setattr(cfg, name, getattr(args, name))
    if not cfg.checkpoint_dir or cfg.checkpoint_dir == "ssl_checkpoints":
        cfg.checkpoint_dir = os.path.join(args.out_dir, "checkpoints")

    if args.synthetic:
        dataset = SyntheticImages(args.synthetic)
    elif args.data_dir:
        dataset = ImageFolder(args.data_dir)
    else:
        raise SystemExit("one of --data_dir / --synthetic is required")

    os.makedirs(args.out_dir, exist_ok=True)
    from dfd_clip_tpu.utils.logging import setup_logging

    setup_logging(args.out_dir)  # per-rank log files; rank 0 also -> stdout
    tracker = Tracker(args.out_dir, enabled=False)
    with open(os.path.join(args.out_dir, "setting.yaml"), "w") as f:
        f.write(cfg.dump())

    trainer = SSLTrainer(cfg, runtime, dataset, tracker=tracker)
    metrics = trainer.run()
    runtime.print("final:", metrics)

    # export the teacher backbone (the eval-ready weights, dinov2 convention);
    # materialize is collective (all-gathers fsdp shards) -> every rank calls
    # it, rank 0 writes
    from dfd_clip_tpu.models import weights as weights_lib

    backbone = runtime.materialize(trainer.teacher["backbone"])
    if runtime.is_main_process:
        weights_lib.save_params(
            os.path.join(args.out_dir, "teacher_backbone.pt"),
            {"backbone": backbone},
        )
    runtime.barrier("ssl_export")
    runtime.print(f"teacher backbone saved to {args.out_dir}/teacher_backbone.pt")


if __name__ == "__main__":
    main()
