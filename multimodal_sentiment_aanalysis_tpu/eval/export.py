"""Serialized deployment artifacts for the serving forward (StableHLO).

Net-new vs the reference, whose only deployment story is re-loading a
``.pth`` state_dict into the Python model class (``Tester.py:29-35``):
serving there is inseparable from the model source. Here the trained
model exports to a single self-contained artifact — the lowered
StableHLO program with the weights baked in — that any JAX process can
deserialize and call WITHOUT this package's model code (the standard
TPU-ecosystem analog of TorchScript/ONNX export).

Built on :func:`jax.export.export`:

- the artifact pins the lowered program + calling convention and is
  portable across processes and machines with the same platform
  (export records the lowering platform; a CPU-exported artifact runs
  on CPU, a TPU-exported one on TPU — pass ``platforms=`` to lower for
  several at once);
- ``batch_size=None`` exports a BATCH-POLYMORPHIC program (symbolic
  leading dim via ``jax.export.symbolic_shape``): one artifact serves
  any batch size. Symbolic shapes require the XLA stem, so polymorphic
  export forces ``use_pallas=False`` — the right trade for a portable
  artifact (the Pallas stem's block grid needs static shapes);
- ``compute_dtype=jnp.bfloat16`` bakes the cast-once-at-build bf16
  weights into the artifact (see :func:`.serving.build_serving_forward`).

Round-trip and polymorphism are pinned by ``tests/test_serving.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .serving import build_serving_forward

#: input schema of the serving forward, (trailing shape, dtype) per arg —
#: the reference's documented modality shapes (printData.py:27-29)
INPUT_SCHEMA = (
    ((32, 585), jnp.float32),  # eeg
    ((38,), jnp.float32),      # eye
    ((230,), jnp.float32),     # pps
)


def export_serving(
    variables: dict,
    path: str | None = None,
    *,
    batch_size: int | None = None,
    feat_dim: int = 256,
    use_pallas: bool | None = None,
    compute_dtype=None,
    platforms=None,
    input_schema=None,
) -> bytes:
    """Export the serving forward to a serialized StableHLO artifact.

    Returns the serialized bytes; also writes them to ``path`` if given.
    ``batch_size=None`` (default) exports batch-polymorphic.
    ``input_schema`` overrides :data:`INPUT_SCHEMA` for non-default model
    dims (e.g. the CLI's ``--tiny`` smoke shapes).
    """
    if input_schema is None:
        input_schema = INPUT_SCHEMA
    if platforms is not None and (len(platforms) > 1 or "tpu" not in platforms):
        # a Mosaic kernel call is only valid in a TPU-only lowering; any
        # portable artifact must trace the XLA stem
        use_pallas = False
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        use_pallas = False  # symbolic dims need the XLA stem
    else:
        b = batch_size
    fwd = build_serving_forward(
        variables, feat_dim=feat_dim, use_pallas=use_pallas,
        compute_dtype=compute_dtype,
    )
    args = tuple(
        jax.ShapeDtypeStruct((b, *shape), dtype)
        for shape, dtype in input_schema
    )
    exported = jax_export.export(fwd, platforms=platforms)(*args)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_serving(path_or_bytes):
    """Deserialize an exported artifact into ``(eeg, eye, pps) -> (arousal,
    valence)``. Needs no model code — only jax.

    The returned callable is jitted: ``Exported.call`` alone rebuilds a
    fresh trace per invocation (milliseconds of host overhead, dwarfing
    the sub-2-ms device time), so one jit wrapper caches the compiled
    program per input shape."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(lambda eeg, eye, pps: exported.call(eeg, eye, pps))
