#!/bin/bash
# Per-video evaluation of the four leave-one-out runs
set -x
COMP=${COMP:-raw}

for i in DF F2F FS NT; do
    echo "Start testing $i"
    python inference.py logs/cross-manipulation-${COMP}/$i
done
