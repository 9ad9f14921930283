"""Tracing/profiling hooks (SURVEY.md §5: the reference has none).

Thin wrappers over jax.profiler so pipelines can be traced to
TensorBoard/XProf without importing profiler plumbing everywhere:

    with trace_to("/tmp/godsp-trace"):
        with annotate("pwelch-chunk"):
            sp.update(block)
"""

from __future__ import annotations

import contextlib
import logging
from typing import Iterator, Optional

import jax

__all__ = ["trace_to", "annotate", "start_server"]

log = logging.getLogger("godsp_tpu.profiling")


@contextlib.contextmanager
def trace_to(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device+host trace of the enclosed block into log_dir
    (viewable in TensorBoard's profile plugin / xprof)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile trace written to %s", log_dir)


def annotate(name: str):
    """Named span in the trace timeline (TraceAnnotation); also usable as
    a decorator via jax.profiler.annotate_function semantics."""
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999) -> Optional[object]:
    """Start the on-demand profiler server (connect with TensorBoard's
    capture-profile button).  Returns the server object or None if
    unsupported on this backend."""
    try:
        return jax.profiler.start_server(port)
    except Exception as e:  # pragma: no cover - backend dependent
        log.warning("profiler server unavailable: %s", e)
        return None
