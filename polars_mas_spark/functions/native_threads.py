"""Runtime native-thread capping for executor Python workers.

The engine's kernels solve tiny (n x ~10) systems; with one Python
worker pinned to every core, any intra-process parallelism (OpenBLAS
threads, pyarrow's pool) only adds contention (session._BLAS_ENV has the
environment-variable version and measurements). Environment variables
only work if they are set before the worker process loads numpy — true
for sessions built by get_spark()/bench.py/__spark_entry__, but NOT
guaranteed when a third-party harness owns the SparkSession. This module
is the runtime fallback: it calls openblas_set_num_threads on the
already-loaded BLAS (what threadpoolctl does; not installed here) and
caps pyarrow's pool, safe to call any number of times.
"""

from __future__ import annotations

_DONE = False


def limit_native_threads(n: int = 1) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    try:
        import ctypes
        import glob
        import os

        import numpy as np

        np_dir = os.path.dirname(np.__file__)
        # Wheel layouts by platform/numpy version:
        # - manylinux numpy 1.x:  numpy.libs/libopenblas64_p-*.so
        # - manylinux numpy 2.x:  numpy.libs/libscipy_openblas64_-*.so
        # - macOS wheels:         numpy/.dylibs/libopenblas*.dylib
        lib_dirs = (np_dir + ".libs", os.path.join(np_dir, ".dylibs"))
        patterns = ("libopenblas*", "libblas*", "libscipy_openblas*")
        for libs_dir in lib_dirs:
            for pattern in patterns:
                for path in glob.glob(os.path.join(libs_dir, pattern)):
                    try:
                        lib = ctypes.CDLL(path)
                    except OSError:
                        continue
                    for sym in ("scipy_openblas_set_num_threads64_",
                                "scipy_openblas_set_num_threads",
                                "openblas_set_num_threads64_",
                                "openblas_set_num_threads"):
                        fn = getattr(lib, sym, None)
                        if fn is not None:
                            fn(int(n))
                            break
    except Exception:
        pass  # best-effort: env vars remain the primary mechanism
    try:
        import pyarrow as pa

        pa.set_cpu_count(int(n))
        pa.set_io_thread_count(max(2, int(n)))
    except Exception:
        pass
