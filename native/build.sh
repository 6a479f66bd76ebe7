#!/bin/sh
# Build the native RLE library. Output lands next to the sources so the
# ctypes loader (devis_tpu/evaluation/_native.py) finds it.
set -e
cd "$(dirname "$0")"
cc -O2 -fPIC -shared -o librle.so rle.c
echo "built $(pwd)/librle.so"
