#!/usr/bin/env bash
# Usage: bash scripts/demo.sh <video> [language] [x y w h]
video=$1; shift
args=(--video "$video")
case "${1-}" in
    ''|*[!0-9.]*)  # first extra arg is not a number -> it is the language
        if [ $# -ge 1 ]; then args+=(--language "$1"); shift; fi ;;
esac
if [ $# -ge 4 ]; then args+=(--init_bbox "$1" "$2" "$3" "$4"); fi
exec python -m uvltrack_tpu.cli.demo "${args[@]}"
