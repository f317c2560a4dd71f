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
def host_callbacks_supported() -> bool:
    """Whether the default backend can run jax.debug callbacks.

    The axon plugin registers itself under the ``tpu`` platform name
    (``jax.default_backend()`` says ``tpu``); it is identifiable only by
    the client's platform-version string.
    """
    try:
        client = jax.devices()[0].client
        version = getattr(client, "platform_version", "") or ""
        return "axon" not in version
    except Exception:  # pragma: no cover - backend probing never fatal
        return True
