#!/bin/bash
# reference main_all.sh equivalent: full sweep
python main_all.py "$@"
