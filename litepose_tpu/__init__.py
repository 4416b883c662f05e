"""litepose_tpu — a TPU-native bottom-up multi-person pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
mit-han-lab/litepose (CVPR'22): the LitePose model family (MobileNetV2-style
backbone + fusion deconv head + large-kernel convs), associative-embedding
grouping, one-shot NAS supernet + evolutionary search, training / eval /
deployment tooling, and HigherHRNet / EfficientHRNet baselines.

Design principles (TPU-first, not a port):
  * NHWC layout, bf16 matmul/conv compute with fp32 params and accumulation.
  * Pure-functional models: ``init(key, ...) -> (params, state)`` and
    ``apply(params, state, x, ...) -> (outputs, new_state)`` pytrees.
  * All postprocessing (NMS, top-k, AE grouping, refinement) runs on device
    with static shapes, batched — no host round trips in the hot path.
  * Parallelism via a single ``jax.sharding.Mesh`` with a ``data`` axis;
    cross-device BatchNorm statistics are implicit under SPMD jit.
  * Elastic NAS supernet via channel masking at max width (XLA-friendly),
    not dynamic-shape slicing.
"""

__version__ = "0.1.0"
