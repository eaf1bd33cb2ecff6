"""gnnep_tpu — a TPU-native GNN message-passing framework for elasticity prediction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
conorjmoran/gnn-elasticity-predictor (reference mounted read-only at
/root/reference): ALIGNN-style atom-graph + line-graph message passing with
heteroscedastic deep ensembles, log-target transforms, conformal calibration,
and a three-mode inference stack — built TPU-first:

- graphs are padded CSR/COO device arrays with static shapes (not PyG objects)
- message passing is fused gather→GEMM→segment-softmax→segment-sum, with
  Pallas TPU kernels for the hot path and a pure-jnp reference implementation
- training is pure-function `jit` steps over optax state pytrees; ensembles
  train member-parallel via `vmap` over a stacked parameter axis
- scale-out is `jax.sharding.Mesh` + `shard_map` with XLA collectives
  (data parallelism over graphs; edge partitioning with boundary exchange)

Layer map (mirrors SURVEY.md §1 for the reference):
  L1 featurization   gnnep_tpu.data.featurize  (native numpy; pymatgen optional)
  L2 dataset/store   gnnep_tpu.data.store / batching / pipeline
  L3 model/ops       gnnep_tpu.models.alignn over gnnep_tpu.ops
  L4 training        gnnep_tpu.train
  L4b calibration    gnnep_tpu.train.calibrate
  L5 evaluation      gnnep_tpu.evaluate
  L6 inference       gnnep_tpu.infer
  L7 parallel        gnnep_tpu.parallel
"""

__version__ = "0.1.0"
