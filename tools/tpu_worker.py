"""Persistent TPU job worker for the flappy dev tunnel.

New-process attachment to the axon tunnel hangs for tens of minutes at a
time (r3 + r5 observed), while ESTABLISHED connections keep working. This
worker attaches once and then executes queued job scripts in-process:

    echo 'print(1+1)' > /tmp/tpu_jobs/010_test.py        # queue a job
    # worker picks it up (sorted order), runs it with exec(), writes
    # /tmp/tpu_jobs/010_test.py.out (stdout+stderr) and .done or .err

Jobs share the process: clean up device arrays (x.delete()) and prefer
functions over module-level globals. A tiny jit fires between polls as a
keepalive. Stop with: touch /tmp/tpu_jobs/STOP

GOTCHA — module staleness: repo modules imported by an earlier job stay
cached (sys.modules). A job that depends on freshly edited code must
purge first:

    import sys
    for m in [k for k in list(sys.modules)
              if k.startswith(("image_retrieval_tpu", "tools"))]:
        del sys.modules[m]

(leave jax loaded — that's the connection being kept alive).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = "/tmp/tpu_jobs"


def main():
    os.makedirs(JOBS, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    print(f"worker up: {jax.devices()}", flush=True)
    tick = jax.jit(lambda a: (a * 2 + 1).sum())
    last_alive = 0.0
    while True:
        if os.path.exists(os.path.join(JOBS, "STOP")):
            print("STOP seen, exiting", flush=True)
            return
        jobs = sorted(
            f for f in os.listdir(JOBS)
            if f.endswith(".py") and not os.path.exists(
                os.path.join(JOBS, f + ".done"))
            and not os.path.exists(os.path.join(JOBS, f + ".err"))
        )
        if not jobs:
            now = time.time()
            if now - last_alive > 240:
                t0 = time.time()
                _ = jax.device_get(tick(jnp.arange(16)))
                print(f"alive {time.strftime('%H:%M:%S')} "
                      f"tick={time.time()-t0:.2f}s", flush=True)
                last_alive = now
            time.sleep(5)
            continue
        name = jobs[0]
        path = os.path.join(JOBS, name)
        print(f"running {name}", flush=True)
        buf = io.StringIO()
        ok = True
        t0 = time.time()
        try:
            with open(path) as f:
                src = f.read()
            g = {"__name__": "__tpu_job__", "__file__": path}
            with contextlib.redirect_stdout(buf), \
                    contextlib.redirect_stderr(buf):
                exec(compile(src, path, "exec"), g)
        except BaseException:
            ok = False
            buf.write(traceback.format_exc())
        dt = time.time() - t0
        with open(path + ".out", "w") as f:
            f.write(buf.getvalue())
        open(path + (".done" if ok else ".err"), "w").write(f"{dt:.1f}s\n")
        print(f"{name}: {'done' if ok else 'ERR'} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
