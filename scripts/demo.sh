#!/bin/bash
# Usage: sh scripts/demo.sh <video> [language] [x y w h]
video=$1; shift
lang=""
if [ $# -ge 1 ] && [[ ! $1 =~ ^[0-9.]+$ ]]; then lang="--language \"$1\""; shift; fi
bbox=""
[ $# -ge 4 ] && bbox="--init_bbox $1 $2 $3 $4"
eval python -m uvltrack_tpu.cli.demo --video "$video" $lang $bbox
