#!/usr/bin/env python
"""Does the axon remote-compile service parallelize?  Compile 4 distinct
copy-kernel chains serially, then 4 MORE distinct ones from 4 threads;
compare wall times.  If threaded ~= serial/4, bench.py can precompile
its chains concurrently and cut its wall time by the compile fraction.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from godsp_tpu._dtypes import put
    from godsp_tpu.utils.metrics import copy_split_pallas

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    log(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    xr = put((rng.normal(size=(4096, 1024)) * 0.01).astype(np.float32))
    xi = put((rng.normal(size=(4096, 1024)) * 0.01).astype(np.float32))

    def make(K, bt):
        @jax.jit
        def chain(r):
            i = xi
            for _ in range(K):
                r, i = copy_split_pallas(r, i, batch_tile=bt)
                r, i = i, r
            return jnp.abs(r[0, 0]) + jnp.abs(i[0, 0])

        return chain

    # Distinct K and bt values force distinct programs (no cache hits).
    serial_specs = [(11, 64), (13, 64), (15, 64), (17, 64)]
    thread_specs = [(11, 128), (13, 128), (15, 128), (17, 128)]

    t0 = time.perf_counter()
    for K, bt in serial_specs:
        f = make(K, bt)
        float(np.asarray(f(xr)))
    t_serial = time.perf_counter() - t0
    log(f"serial 4 compiles: {t_serial:.1f} s")

    def compile_one(spec):
        K, bt = spec
        f = make(K, bt)
        float(np.asarray(f(xr)))
        return None

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(compile_one, thread_specs))
    t_thread = time.perf_counter() - t0
    log(f"threaded 4 compiles: {t_thread:.1f} s "
        f"(speedup {t_serial/t_thread:.2f}x)")


if __name__ == "__main__":
    main()
