"""Backend capability probes.

The axon-tunneled TPU runtime in this image rejects host send/recv
callbacks ("axon_pjrt does not support host send/recv callbacks"), which
breaks ``jax.debug.print`` / ``jax.debug.callback`` inside any compiled
computation.  Verbose iteration tables and traced-warning delivery are
gated on this probe; on unsupported backends they degrade gracefully
(verbose output is dropped, soft-failure warnings are still emitted on
eager calls where values are concrete).
"""

import functools

import jax

__all__ = ["host_callbacks_supported"]


@functools.lru_cache(maxsize=None)
def _callbacks_supported_on(platform: str) -> bool:
    del platform  # cache key only: invalidates on platform switch
    try:
        client = jax.devices()[0].client
        version = getattr(client, "platform_version", "") or ""
        return "axon" not in version
    except Exception:  # pragma: no cover - backend probing never fatal
        return True


def host_callbacks_supported() -> bool:
    """Whether the default backend can run jax.debug callbacks.

    The axon plugin registers itself under the ``tpu`` platform name
    (``jax.default_backend()`` says ``tpu``); it is identifiable only by
    the client's platform-version string.  The probe is cached per
    *backend platform*, not per process: switching platforms mid-process
    (``jax.config.update('jax_platforms', 'cpu')`` — the documented CPU
    recipe) re-probes instead of reusing the other backend's answer.
    """
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "unknown"
    return _callbacks_supported_on(platform)
