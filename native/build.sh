#!/bin/sh
# Build the native host-feeder library. Output lands next to this script;
# ecamp_tpu.data.native looks there (or $ECAMP_NATIVE_LIB).
set -e
cd "$(dirname "$0")"
# build to a temp name, then rename: overwriting the .so in place would
# truncate pages mapped by live feeder processes (SIGBUS); rename leaves
# the old inode intact for them
g++ -O3 -march=native -std=c++17 -shared -fPIC -D_GNU_SOURCE \
    ecamp_host.cpp -o libecamp_host.so.tmp
mv -f libecamp_host.so.tmp libecamp_host.so
echo "built $(pwd)/libecamp_host.so"
