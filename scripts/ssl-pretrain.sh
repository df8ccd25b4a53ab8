#!/bin/bash
# DINOv2-style SSL pretraining on an image folder
set -x
python ssl_train.py --data_dir "$1" --cfg configs/ssl/base.yaml --out_dir "${2:-logs/ssl}"
