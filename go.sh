#!/bin/bash
# reference go.sh equivalent: single run with preset overlays on chip $1
python main.py --overwrite_args --gpu "${1:-0}" "${@:2}"
