"""One-dispatch flax module initialization.

Flax's ``Module.init`` runs eagerly: every parameter's RNG split + sampler is
its own XLA program and its own device dispatch. Through a tunneled TPU
runtime (one round trip per dispatch, tens to hundreds of ms each) the TSR
stack's ~300 parameters cost ~90 s to initialize. Wrapping the WHOLE init in
one ``jax.jit`` makes it a single compiled program and a single dispatch
(~5 s cold including compile, sub-second warm via the persistent cache).
"""

from __future__ import annotations

import jax


def jitted_init(module, seed: int, *args, method=None):
    """``module.init(PRNGKey(seed), *args)`` as ONE jitted program.

    ``args`` are the dummy inputs (closed over as constants so they never
    transfer); returns the variables pytree on the default device.
    """
    kwargs = {"method": method} if method is not None else {}

    @jax.jit
    def _init(key):
        return module.init(key, *args, **kwargs)

    return _init(jax.random.PRNGKey(seed))
