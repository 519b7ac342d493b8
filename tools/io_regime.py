#!/usr/bin/env python3
"""Cheap host-I/O regime probe (round 21): write + fsync + read back 256 MB
under target/scratch, print seconds. The bench's in-Spark io calibration
reads ~1.15 s nominal; this probe's clean-window reading is recorded at
first use and compared by eye — it exists so a full bench capture can be
SCHEDULED into a clean window instead of discovering the regime after
spending 4 minutes. Not part of the driver contract."""
import os, time, sys

d = "/root/repo/target/scratch/io_regime"
os.makedirs(d, exist_ok=True)
p = os.path.join(d, "blob")
buf = os.urandom(1 << 20)
t0 = time.time()
with open(p, "wb") as f:
    for _ in range(256):
        f.write(buf)
    f.flush()
    os.fsync(f.fileno())
t1 = time.time()
n = 0
with open(p, "rb") as f:
    while True:
        b = f.read(1 << 20)
        if not b:
            break
        n += len(b)
t2 = time.time()
os.unlink(p)
print(f"write+fsync {t1-t0:.3f} s, read {t2-t1:.3f} s, total {t2-t0:.3f} s ({n>>20} MB)")
