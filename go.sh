#!/bin/bash
# reference go.sh equivalent: single run with preset overlays
python main.py --overwrite_args "$@"
