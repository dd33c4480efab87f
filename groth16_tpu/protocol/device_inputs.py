"""Host->device marshalling of a ZKey + Witness into the flat tensor inputs
of `prover.prove_core_device` (and its sharded variant)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import curve as C
from ..protocol.types import Witness, ZKey
from .prover import Mask, _device_points


def _single_point(cv, host_pt):
    P = C.points_from_host(cv, [host_pt])
    return tuple(x[0] for x in P)


def prove_core_inputs(zkey: ZKey, wtns: Witness, mask: Mask):
    """Returns (flavour, log2n, args_tuple) for prove_core_device."""
    from ..ops.limbs import int_to_limbs
    from ..ops.field import FR

    from .prover import zkey_device_args

    hdr = zkey.header
    args = (
        jnp.asarray(wtns.values),
        *zkey_device_args(zkey),
        jnp.asarray(np.stack([int_to_limbs(mask.r % FR.modulus),
                              int_to_limbs(mask.s % FR.modulus)])),
    )
    return hdr.flavour, hdr.log_domain_size, args
