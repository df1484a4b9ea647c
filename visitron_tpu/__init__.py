"""VISITRON-TPU: a TPU-native vision-and-dialog navigation (VLN / CVDN-NDH) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of alexa/visitron
(reference layout documented in SURVEY.md): multimodal (Oscar-style) BERT
pretraining, viewpoint-selection and turn-based navigation fine-tuning, a
question-asking classifier, trajectory evaluation (GP/SR/SPL/nDTW/CLS), an
offline image-feature pipeline, and a batched graph simulator.

Design principles (TPU-first, not a port):
  * All hot-loop compute is jitted with static shapes; episodes roll out via
    ``lax.scan`` on device (teacher forcing needs no host in the loop at all).
  * Data parallelism via ``jax.sharding.Mesh`` + NamedSharding; gradients are
    averaged by XLA collectives inside the jitted train step (no DDP machinery).
  * Features live in packed device-friendly arrays (gathers instead of dict
    lookups in the step loop).
  * The simulator is a pose/graph state machine (the reference runs MatterSim
    rendering-disabled); we provide a batched C++ engine with a pure-Python
    fallback of identical semantics.
"""

__version__ = "0.1.0"
