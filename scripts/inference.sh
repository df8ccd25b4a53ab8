#!/bin/bash
python inference.py $1 --batch_size=16 --modality=${2:-video} --weight_mode=${3:-best} --cfg_name=setting
