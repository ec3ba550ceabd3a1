"""API-surface parity: every reference component mapped in MIGRATION.md must
exist at its documented location (SURVEY.md §2 inventory, `MinkowskiEngine/
__init__.py:53-221` export list).  Pure attribute checks — no tracing."""

import mink_octtree_stablediffusion_tpu as mt


def _has(obj, name):
    assert hasattr(obj, name), f"{obj.__name__}.{name} missing"


def test_tensor_layer_surface():
    for n in ["sparse_tensor", "SparseTensor", "TensorField", "cat",
              "stack_sum", "stack_mean", "stack_var", "slice_to_field",
              "cat_slice", "interpolate_at", "to_sparse_dense"]:
        _has(mt, n)
    st_attrs = ["C", "F", "coordinates", "features", "tensor_stride",
                "dense", "decomposed_features", "with_features",
                "mask_features", "count"]
    fields = getattr(mt.SparseTensor, "__dataclass_fields__", {})
    for n in st_attrs:
        assert hasattr(mt.SparseTensor, n) or n in fields, (
            f"SparseTensor.{n} missing")


def test_ops_surface():
    for n in ["make_grid", "stride_grid", "kernel_map", "origin_grid",
              "union", "interpolation_weights", "get_coords_map",
              "KernelSpec", "grid_lookup", "sparse_quantize_np",
              "batched_coordinates_np", "pad_to_capacity", "prune",
              "top_k_mask", "interpolate", "splat", "reduce_by_inverse",
              "slice_by_inverse", "coo_spmm", "morton_encode", "morton_decode",
              "fused_sparse_conv", "sparse_conv_apply", "use_onehot_conv",
              "set_default_compute_dtype", "enable_dense_conv"]:
        _has(mt.ops, n)
    _has(mt, "dense_coordinates")


def test_nn_surface():
    for n in ["SparseConv", "SparseConvTranspose", "GenerativeConvTranspose",
              "UpsampleInterpolate", "ChannelwiseConv", "Linear", "LocalPool",
              "PoolTranspose", "GlobalPool", "broadcast_op",
              "broadcast_concat", "BatchNorm", "InstanceNorm",
              "StableInstanceNorm", "StableGroupNorm", "AdaStableInstanceNorm",
              "GroupNormDense", "Dropout", "Sinusoidal", "get_act",
              "SparseTransformer", "SparseAttention",
              "MortonWindowTransformer", "BasicBlock", "ResNetStack",
              "remat_stack", "ResBasicBlock", "ResBottleneck", "SELayer",
              "SEBasicBlock", "SEBottleneck", "TimestepEmbedding",
              "timesteps_embedding", "LinearPositionalEncoding",
              # parity tail (r2): HjmInstanceNorm + remaining activations
              "HjmInstanceNorm", "PReLU", "RReLU", "AlphaDropout",
              "AdaptiveLogSoftmaxWithLoss", "hardshrink", "softshrink",
              "threshold"]:
        _has(mt.nn, n)
    # tail activation functions reachable through the named lookup
    for n in ["softmin", "log_sigmoid", "hardshrink", "softshrink",
              "tanhshrink", "relu6", "selu", "celu", "leaky_relu",
              "hardswish", "hardsigmoid", "hardtanh", "softplus",
              "softsign"]:
        mt.nn.get_act(n)


def test_models_surface():
    from mink_octtree_stablediffusion_tpu import models as mm
    for n in ["VAE", "vae_loss", "VQVAE", "VectorQuantizer", "UNet",
              "MinkowskiFCNN", "MinkowskiSplatFCNN", "PointNet",
              "MinkowskiPointNet", "ResNet14", "ResNet18", "ResNet34",
              "ResNet50", "ResNet101", "MinkUNet14", "MinkUNet34C",
              "GenerativeNet", "CompletionNet", "UNet3DModel",
              # dense conditioned baseline (r2): diffusers-UNet3DCondition
              # equivalent + dense transformer blocks
              "UNet3DConditionModel", "DenseAttention",
              "DenseTransformer3D"]:
        _has(mm, n)


def test_diffusion_surface():
    from mink_octtree_stablediffusion_tpu import diffusion as md
    for n in ["DDPMScheduler", "DDIMScheduler", "diffusion_training_loss",
              "sample_latent", "CoordNLLParams"]:
        _has(md, n)


def test_train_utils_surface():
    from mink_octtree_stablediffusion_tpu import train as mtr
    from mink_octtree_stablediffusion_tpu import utils as mu
    from mink_octtree_stablediffusion_tpu import data as mdata
    for n in ["TrainState", "make_train_step", "make_dp_train_step",
              "CheckpointManager", "vae_optimizer", "diffusion_optimizer",
              "warmup_cosine"]:
        _has(mtr, n)
    for n in ["print_diagnostics", "get_device_memory_info", "summary",
              "count_params", "gradcheck", "render_pointclouds",
              "backend_selfcheck", "capacity_report",
              "load_torch_state_dict", "convert_module", "strip_prefix"]:
        _has(mu, n)
    for n in ["ModelNet40Dataset", "ShapeNetDataset", "ObjaverseDataset",
              "SyntheticShapes", "resample_mesh", "collate_pointclouds",
              "collate_fields", "batch_iterator", "PrefetchLoader"]:
        _has(mdata, n)
    for n in ["set_algorithm", "get_algorithm", "Algorithm"]:
        _has(mt, n)
    _has(mt, "parallel")
    for n in ["data_parallel_mesh", "dp_tp_mesh", "shard_model_params",
              "initialize_distributed"]:
        _has(mt.parallel, n)


def test_migration_map_covers_every_reference_export():
    """VERDICT r1 item 8 done-criterion: MIGRATION.md maps EVERY symbol the
    reference exports (`MinkowskiEngine/__init__.py:53-221`) — by name, in
    the appendix table or the per-layer rows."""
    import os
    import re

    import pytest

    ref = "/root/reference/MinkowskiEngine/__init__.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not available")
    lines = open(ref).read().splitlines()[52:221]
    syms = set()
    for ln in lines:
        m = re.match(r"^\s+([A-Za-z_][A-Za-z0-9_]*),?\s*$", ln)
        if m:
            syms.add(m.group(1))
    here = os.path.join(os.path.dirname(__file__), "..", "MIGRATION.md")
    mig = open(here).read()
    missing = sorted(s for s in syms if s not in mig)
    assert not missing, f"unmapped reference exports: {missing}"
