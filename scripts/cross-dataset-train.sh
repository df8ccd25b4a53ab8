#!/bin/bash
COMP=${COMP:-c23}
python main.py --cfg configs/cross-dataset/${COMP}/ff.yaml
