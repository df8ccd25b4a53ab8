#!/bin/bash
# Leave-one-out cross-manipulation training (reference scripts/cross-manipulation-train.sh)
set -x
COMP=${COMP:-raw}

python main.py --cfg configs/cross-manipulation/${COMP}/df.yaml
python main.py --cfg configs/cross-manipulation/${COMP}/f2f.yaml
python main.py --cfg configs/cross-manipulation/${COMP}/fs.yaml
python main.py --cfg configs/cross-manipulation/${COMP}/nt.yaml
