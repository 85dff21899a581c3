#!/usr/bin/env python3
"""Long-lived TPU lab worker: executes numbered job files in one process
so jit caches persist across experiments (the per-process tunnel setup
cost is ~20+ min in degraded states; this pays it once).

Protocol: watch /tmp/lab/job_NNN.py; exec each (shared namespace `NS`)
in order; append stdout+traceback to /tmp/lab/log.txt; write
/tmp/lab/done_NNN when finished.
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAB = "/tmp/lab"
os.makedirs(LAB, exist_ok=True)
LOG = os.path.join(LAB, "log.txt")


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


import jax  # noqa: E402

log(f"=== worker up, devices={jax.devices()} pid={os.getpid()}")

done = set()
while True:
    jobs = sorted(f for f in os.listdir(LAB)
                  if f.startswith("job_") and f.endswith(".py"))
    for j in jobs:
        tag = j[4:-3]
        marker = os.path.join(LAB, f"done_{tag}")
        if tag in done or os.path.exists(marker):
            done.add(tag)
            continue
        log(f"--- running {j} at {time.strftime('%H:%M:%S')}")
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            src = open(os.path.join(LAB, j)).read()
            exec(compile(src, j, "exec"), globals())
            ok = True
        except SystemExit:
            ok = True
        except Exception:
            buf.write(traceback.format_exc())
            ok = False
        finally:
            sys.stdout = old
        log(buf.getvalue())
        log(f"--- {j} {'ok' if ok else 'FAILED'} at {time.strftime('%H:%M:%S')}")
        open(marker, "w").write("1")
        done.add(tag)
    time.sleep(2)
