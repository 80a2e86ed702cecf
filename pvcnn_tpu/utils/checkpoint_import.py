"""Import released PyTorch `.pth.tar` checkpoints into pvcnn_tpu parameter trees.

The reference ships pretrained checkpoints (reference README.md:81-126) whose
state dicts follow the torch module naming of models/** and modules/**. This shim
maps those names onto our flax parameter/batch-stats trees and transposes weights
into channel-last layouts:

    Conv1d/Conv2d 1x1 [out, in, 1(,1)]  -> Dense kernel [in, out]
    Linear        [out, in]             -> Dense kernel [in, out]
    Conv3d        [out, in, kd, kh, kw] -> Conv kernel [kd, kh, kw, in, out]
    BatchNorm     weight/bias/running_* -> scale/bias + batch_stats mean/var

Mappings are emitted structurally from the same block specs the models are built
from, so torch-name <-> flax-path pairing is explicit rather than order-based.
Currently covers the PVCNN family (ShapeNet + S3DIS — the BASELINE.json parity
configs) and the plain PointNet variants built from create_pointnet_components /
create_mlp_components.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

__all__ = ["load_torch_state_dict", "import_state_dict",
           "pvcnn_shapenet_mapping", "pvcnn_s3dis_mapping",
           "pointnet_shapenet_mapping", "pointnet_s3dis_mapping",
           "pointnet2_shapenet_mapping", "pvcnn2_s3dis_mapping",
           "frustum_mapping"]


def prefixed(entries, torch_prefix: str, flax_prefix: str):
    return [(f"{torch_prefix}{t}", f"{flax_prefix}{f}", k)
            for t, f, k in entries]


# ---- mapping emitters --------------------------------------------------------
# A mapping is a list of (torch_prefix, flax_path, kind) with kind in
# {'dense', 'conv3d', 'bn'}; torch_prefix is the module path owning
# weight/bias(/running_mean/...).


def shared_mlp_entries(torch_prefix: str, flax_prefix: str,
                       num_layers: int) -> List[Tuple[str, str, str]]:
    """Reference SharedMLP: layers.(3k) Conv, layers.(3k+1) BN
    (modules/shared_mlp.py:21-27)."""
    out = []
    for k in range(num_layers):
        out.append((f"{torch_prefix}.layers.{3 * k}",
                    f"{flax_prefix}/Dense_{k}", "dense"))
        out.append((f"{torch_prefix}.layers.{3 * k + 1}",
                    f"{flax_prefix}/BatchNorm_{k}", "bn"))
    return out


def linear_bn_relu_entries(torch_prefix: str, flax_prefix: str):
    """Reference _linear_bn_relu Sequential (models/utils.py:11-12)."""
    return [(f"{torch_prefix}.0", f"{flax_prefix}/Dense_0", "dense"),
            (f"{torch_prefix}.1", f"{flax_prefix}/BatchNorm_0",
             "bn")]


def pvconv_entries(torch_prefix: str, flax_prefix: str, with_se: bool):
    """Reference PVConv voxel_layers indices 0/1/3/4 (+6 SE) + point SharedMLP
    (modules/pvconv.py:20-31)."""
    out = [
        (f"{torch_prefix}.voxel_layers.0", f"{flax_prefix}/Conv_0", "conv3d"),
        (f"{torch_prefix}.voxel_layers.1",
         f"{flax_prefix}/BatchNorm_0", "bn"),
        (f"{torch_prefix}.voxel_layers.3", f"{flax_prefix}/Conv_1", "conv3d"),
        (f"{torch_prefix}.voxel_layers.4",
         f"{flax_prefix}/BatchNorm_1", "bn"),
    ]
    if with_se:
        out.append((f"{torch_prefix}.voxel_layers.6.fc.0",
                    f"{flax_prefix}/SE3d_0/Dense_0", "dense"))
        out.append((f"{torch_prefix}.voxel_layers.6.fc.2",
                    f"{flax_prefix}/SE3d_0/Dense_1", "dense"))
    out += shared_mlp_entries(f"{torch_prefix}.point_features",
                              f"{flax_prefix}/SharedMLP_0", 1)
    return out


def point_blocks_entries(blocks, torch_prefix: str, with_se: bool,
                         start_counts: Dict[str, int] | None = None):
    """create_pointnet_components layer list (models/utils.py:48-64): PVConv for
    voxel blocks, SharedMLP otherwise. Flax auto-names count per class at the
    model's top level."""
    counts = start_counts if start_counts is not None else {}
    entries = []
    i = 0
    for out_channels, num_blocks, voxel_resolution in blocks:
        for _ in range(num_blocks):
            if voxel_resolution is None:
                k = counts.get("SharedMLP", 0)
                counts["SharedMLP"] = k + 1
                entries += shared_mlp_entries(f"{torch_prefix}.{i}",
                                              f"SharedMLP_{k}", 1)
            else:
                k = counts.get("PVConv", 0)
                counts["PVConv"] = k + 1
                entries += pvconv_entries(f"{torch_prefix}.{i}", f"PVConv_{k}",
                                          with_se)
            i += 1
    return entries, counts


def mlp_classifier_entries(out_channels, torch_prefix: str, dim: int,
                           counts: Dict[str, int]):
    """create_mlp_components classifier (models/utils.py:15-45); dropout entries
    occupy torch Sequential slots but hold no parameters."""
    entries = []
    i = 0
    specs = list(out_channels)
    for oc in specs[:-1]:
        if oc < 1:
            i += 1  # Dropout
            continue
        if dim == 1:
            k = counts.get("DenseBNReLU", 0)
            counts["DenseBNReLU"] = k + 1
            entries += linear_bn_relu_entries(f"{torch_prefix}.{i}",
                                              f"DenseBNReLU_{k}")
        else:
            k = counts.get("SharedMLP", 0)
            counts["SharedMLP"] = k + 1
            entries += shared_mlp_entries(f"{torch_prefix}.{i}",
                                          f"SharedMLP_{k}", 1)
        i += 1
    # final classifier layer: plain Conv1d/Linear -> Dense
    k = counts.get("Dense", 0)
    counts["Dense"] = k + 1
    entries.append((f"{torch_prefix}.{i}", f"Dense_{k}", "dense"))
    return entries, counts


def pvcnn_shapenet_mapping():
    """models/shapenet/pvcnn.py:10: blocks + [256,0.2,256,0.2,128,C] classifier,
    with_se=True."""
    blocks = ((64, 1, 32), (128, 2, 16), (512, 1, None), (2048, 1, None))
    entries, counts = point_blocks_entries(blocks, "point_features",
                                           with_se=True)
    cls_entries, _ = mlp_classifier_entries([256, 0.2, 256, 0.2, 128, -1],
                                            "classifier", dim=2, counts=counts)
    return entries + cls_entries


def pvcnn_s3dis_mapping():
    """models/s3dis/pvcnn.py:10: blocks + cloud MLP [256,128] + classifier
    [512,0.3,256,0.3,C], with_se=False."""
    blocks = ((64, 1, 32), (64, 2, 16), (128, 1, 16), (1024, 1, None))
    entries, counts = point_blocks_entries(blocks, "point_features",
                                           with_se=False)
    for j in range(2):
        k = counts.get("DenseBNReLU", 0)
        counts["DenseBNReLU"] = k + 1
        entries += linear_bn_relu_entries(f"cloud_features.{j}",
                                          f"DenseBNReLU_{k}")
    cls_entries, _ = mlp_classifier_entries([512, 0.3, 256, 0.3, -1],
                                            "classifier", dim=2, counts=counts)
    return entries + cls_entries


def _mlp_tail_entries(out_channels, torch_prefix: str, dim: int,
                      classifier: bool, counts: Dict[str, int]):
    """create_mlp_components in non-classifier OR classifier form
    (models/utils.py:15-45)."""
    if classifier:
        return mlp_classifier_entries(out_channels, torch_prefix, dim, counts)
    entries = []
    i = 0
    for oc in out_channels:
        if oc < 1:
            i += 1
            continue
        if dim == 1:
            k = counts.get("DenseBNReLU", 0)
            counts["DenseBNReLU"] = k + 1
            entries += linear_bn_relu_entries(f"{torch_prefix}.{i}",
                                              f"DenseBNReLU_{k}")
        else:
            k = counts.get("SharedMLP", 0)
            counts["SharedMLP"] = k + 1
            entries += shared_mlp_entries(f"{torch_prefix}.{i}",
                                          f"SharedMLP_{k}", 1)
        i += 1
    return entries, counts


def _sa_module_entries(sa_configs, torch_prefix: str, flax_name: str):
    """PointNetSAModule / PointNetAModule: `mlps` ModuleList of SharedMLP
    branches (modules/pointnet.py:22-28, 67-76). Channel lists may be flat or
    per-scale nested."""
    num_centers, radius, _, out_channels = sa_configs
    if not isinstance(out_channels[0], (list, tuple)):
        branches = [list(out_channels)]
    else:
        branches = [list(oc) for oc in out_channels]
    if num_centers is not None and isinstance(radius, (list, tuple)) \
            and len(branches) == 1 and len(radius) > 1:
        branches = branches * len(radius)
    entries = []
    for s, branch in enumerate(branches):
        entries += shared_mlp_entries(f"{torch_prefix}.mlps.{s}",
                                      f"{flax_name}/SharedMLP_{s}",
                                      len(branch))
    return entries


def sa_layers_entries(sa_blocks, torch_prefix: str, counts: Dict[str, int],
                      with_se: bool = False):
    """create_pointnet2_sa_components layer groups (models/utils.py:67-109):
    optional PVConv/SharedMLP pre-convs + one SA/A module, Sequential-wrapped in
    torch when the group has more than one member."""
    entries = []
    for i, (conv_configs, sa_configs) in enumerate(sa_blocks):
        group_prefix = f"{torch_prefix}.{i}"
        members = 0
        if conv_configs is not None:
            _, num_blocks, voxel_resolution = conv_configs
            for _ in range(num_blocks):
                tp = f"{group_prefix}.{members}"
                if voxel_resolution is None:
                    k = counts.get("SharedMLP", 0)
                    counts["SharedMLP"] = k + 1
                    entries += shared_mlp_entries(tp, f"SharedMLP_{k}", 1)
                else:
                    k = counts.get("PVConv", 0)
                    counts["PVConv"] = k + 1
                    entries += pvconv_entries(tp, f"PVConv_{k}", with_se)
                members += 1
        num_centers = sa_configs[0]
        cls = ("PointNetAModule" if num_centers is None
               else "PointNetSAModule")
        k = counts.get(cls, 0)
        counts[cls] = k + 1
        sa_tp = f"{group_prefix}.{members}" if members else group_prefix
        entries += _sa_module_entries(sa_configs, sa_tp, f"{cls}_{k}")
    return entries, counts


def fp_layers_entries(fp_blocks, torch_prefix: str, counts: Dict[str, int],
                      with_se: bool = False):
    """create_pointnet2_fp_modules groups (models/utils.py:112-140)."""
    entries = []
    for i, (fp_configs, conv_configs) in enumerate(fp_blocks):
        group_prefix = f"{torch_prefix}.{i}"
        multi = conv_configs is not None
        fp_tp = f"{group_prefix}.0" if multi else group_prefix
        k = counts.get("PointNetFPModule", 0)
        counts["PointNetFPModule"] = k + 1
        entries += shared_mlp_entries(f"{fp_tp}.mlp",
                                      f"PointNetFPModule_{k}/SharedMLP_0",
                                      len(fp_configs))
        if multi:
            _, num_blocks, voxel_resolution = conv_configs
            for j in range(num_blocks):
                tp = f"{group_prefix}.{1 + j}"
                if voxel_resolution is None:
                    kk = counts.get("SharedMLP", 0)
                    counts["SharedMLP"] = kk + 1
                    entries += shared_mlp_entries(tp, f"SharedMLP_{kk}", 1)
                else:
                    kk = counts.get("PVConv", 0)
                    counts["PVConv"] = kk + 1
                    entries += pvconv_entries(tp, f"PVConv_{kk}", with_se)
    return entries, counts


def pointnet_shapenet_mapping(with_transformer: bool = False):
    """models/shapenet/pointnet.py:38-82."""
    blocks = ((True, 64, 1), (False, 128, 2), (True, 512, 1), (False, 2048, 1))
    entries: list = []
    counts: Dict[str, int] = {}
    i = 0
    for with_t, _, num_blocks in blocks:
        for bi in range(num_blocks):
            tp = f"point_features.{i}"
            if with_t and with_transformer and bi == 0:
                k = counts.get("Transformer", 0)
                counts["Transformer"] = k + 1
                fp = f"Transformer_{k}"
                for j in range(3):
                    entries += shared_mlp_entries(
                        f"{tp}.0.features.{j}", f"{fp}/SharedMLP_{j}", 1)
                entries += [
                    (f"{tp}.0.tranformer.0", f"{fp}/DenseBNReLU_0/Dense_0",
                     "dense"),
                    (f"{tp}.0.tranformer.1",
                     f"{fp}/DenseBNReLU_0/BatchNorm_0", "bn"),
                    (f"{tp}.0.tranformer.3", f"{fp}/DenseBNReLU_1/Dense_0",
                     "dense"),
                    (f"{tp}.0.tranformer.4",
                     f"{fp}/DenseBNReLU_1/BatchNorm_0", "bn"),
                    (f"{tp}.0.tranformer.6", f"{fp}/Dense_0", "dense"),
                ]
                mlp_tp = f"{tp}.1"
            else:
                mlp_tp = tp
            k = counts.get("SharedMLP", 0)
            counts["SharedMLP"] = k + 1
            entries += shared_mlp_entries(mlp_tp, f"SharedMLP_{k}", 1)
            i += 1
    # classifier: SharedMLP,Dropout,SharedMLP,Dropout,SharedMLP,Conv1d
    for j, slot in ((0, 0), (1, 2), (2, 4)):
        k = counts.get("SharedMLP", 0)
        counts["SharedMLP"] = k + 1
        entries += shared_mlp_entries(f"classifier.{slot}", f"SharedMLP_{k}", 1)
    # the final model-level Dense is Dense_1 when a transformer exists? No:
    # Transformer's Dense lives in its own scope, so the model-level final
    # classifier layer is Dense_0 either way
    entries.append(("classifier.5", "Dense_0", "dense"))
    return entries


def pointnet_s3dis_mapping():
    """models/s3dis/pointnet.py:10-36."""
    blocks = ((64, 3, None), (128, 1, None), (1024, 1, None))
    entries, counts = point_blocks_entries(blocks, "point_features",
                                           with_se=False)
    for j in range(2):
        k = counts.get("DenseBNReLU", 0)
        counts["DenseBNReLU"] = k + 1
        entries += linear_bn_relu_entries(f"cloud_features.{j}",
                                          f"DenseBNReLU_{k}")
    cls_entries, _ = mlp_classifier_entries([512, 256, 0.3, -1], "classifier",
                                            dim=2, counts=counts)
    return entries + cls_entries


def pointnet2_shapenet_mapping(msg: bool = False):
    """models/shapenet/pointnetpp.py: SSG/MSG SA + FP + classifier."""
    from pvcnn_tpu.models.shapenet.pointnetpp import (MSG_FP_BLOCKS,
                                                      MSG_SA_BLOCKS,
                                                      SSG_FP_BLOCKS,
                                                      SSG_SA_BLOCKS)

    sa_blocks = MSG_SA_BLOCKS if msg else SSG_SA_BLOCKS
    fp_blocks = MSG_FP_BLOCKS if msg else SSG_FP_BLOCKS
    entries, counts = sa_layers_entries(sa_blocks, "sa_layers", {})
    fp_entries, counts = fp_layers_entries(fp_blocks, "fp_layers", counts)
    cls_entries, _ = mlp_classifier_entries([128, 0.5, -1], "classifier",
                                            dim=2, counts=counts)
    return entries + fp_entries + cls_entries


def pvcnn2_s3dis_mapping():
    """models/s3dis/pvcnnpp.py: SA groups with PVConv pre-convs (with_se=True),
    FP groups with PVConv post-convs, classifier."""
    from pvcnn_tpu.models.s3dis.pvcnnpp import PVCNN2

    entries, counts = sa_layers_entries(PVCNN2.sa_blocks, "sa_layers", {},
                                        with_se=True)
    fp_entries, counts = fp_layers_entries(PVCNN2.fp_blocks, "fp_layers",
                                           counts, with_se=True)
    cls_entries, _ = mlp_classifier_entries([128, 0.5, -1], "classifier",
                                            dim=2, counts=counts)
    return entries + fp_entries + cls_entries


def _instance_seg_mapping(variant: str):
    """segmentation/pointnet.py: point blocks + cloud blocks + classifier."""
    if variant == "pointnet":
        point_blocks = ((64, 3, None),)
        cloud_blocks = ((128, 1, None), (1024, 1, None))
    else:  # pvcnn
        point_blocks = ((64, 2, 16), (64, 1, 12), (128, 1, 12),
                        (1024, 1, None))
        cloud_blocks = ()
    entries, counts = point_blocks_entries(point_blocks, "point_features",
                                           with_se=False)
    cloud_entries, counts = point_blocks_entries(cloud_blocks,
                                                 "cloud_features",
                                                 with_se=False,
                                                 start_counts=counts)
    cls_entries, _ = mlp_classifier_entries([512, 256, 128, 128, 0.5, -1],
                                            "classifier", dim=2, counts=counts)
    return entries + cloud_entries + cls_entries


def _center_reg_mapping():
    """center_regression_net.py:10-32."""
    counts: Dict[str, int] = {}
    entries, counts = _mlp_tail_entries([128, 128, 256], "features", dim=2,
                                        classifier=False, counts=counts)
    reg_entries, _ = mlp_classifier_entries([256, 128, -1], "regression",
                                            dim=1, counts=counts)
    return entries + reg_entries


def _box_est_pointnet_mapping():
    """box_estimation/pointnet.py:10-47."""
    blocks = ((128, 2, None), (256, 1, None), (512, 1, None))
    entries, counts = point_blocks_entries(blocks, "features", with_se=False)
    cls_entries, _ = mlp_classifier_entries([512, 256, -1], "classifier",
                                            dim=1, counts=counts)
    return entries + cls_entries


def _instance_seg_pointnet2_mapping():
    """segmentation/pointnetpp.py:9-57: MSG SA + FP + [128, 0.3, 2] classifier."""
    from pvcnn_tpu.models.kitti.frustum.segmentation import (
        InstanceSegmentationPointNet2 as M)

    entries, counts = sa_layers_entries(M.sa_blocks, "sa_layers", {})
    fp_entries, counts = fp_layers_entries(M.fp_blocks, "fp_layers", counts)
    cls_entries, _ = mlp_classifier_entries([128, 0.3, -1], "classifier",
                                            dim=2, counts=counts)
    return entries + fp_entries + cls_entries


def _box_est_pointnet2_mapping():
    """box_estimation/pointnetpp.py:9-55: SA stack named `features` + dim-1
    classifier head."""
    from pvcnn_tpu.models.kitti.frustum.box_estimation import (
        BoxEstimationPointNet2 as M)

    entries, counts = sa_layers_entries(M.sa_blocks, "features", {})
    cls_entries, _ = mlp_classifier_entries([512, 256, -1], "classifier",
                                            dim=1, counts=counts)
    return entries + cls_entries


def frustum_mapping(variant: str = "pvcnne"):
    """models/kitti/frustum/frustum_net.py: inst_seg_net + center_reg_net +
    box_est_net sub-trees. variant in {'pointnet', 'pointnet2', 'pvcnne'}."""
    if variant == "pointnet2":
        entries = prefixed(_instance_seg_pointnet2_mapping(), "inst_seg_net.",
                           "InstanceSegmentationPointNet2_0/")
        entries += prefixed(_center_reg_mapping(), "center_reg_net.",
                            "CenterRegressionNet_0/")
        entries += prefixed(_box_est_pointnet2_mapping(), "box_est_net.",
                            "BoxEstimationPointNet2_0/")
        return entries
    seg_variant = "pvcnn" if variant == "pvcnne" else "pointnet"
    entries = prefixed(_instance_seg_mapping(seg_variant), "inst_seg_net.",
                       "InstanceSegmentationNet_0/")
    entries += prefixed(_center_reg_mapping(), "center_reg_net.",
                        "CenterRegressionNet_0/")
    entries += prefixed(_box_est_pointnet_mapping(), "box_est_net.",
                        "BoxEstimationPointNet_0/")
    return entries


# ---- state-dict application --------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pth.tar and return its model state dict as numpy,
    stripped of the DataParallel 'module.' prefix."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state = checkpoint["model"] if "model" in checkpoint else checkpoint
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy()
                            if hasattr(v, "detach") else v)
    return out


def _set(tree: dict, path: str, leaf: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        if part not in node:
            raise KeyError(f"flax path {path} not found (missing {part}; "
                           f"have {list(node)})")
        node = node[part]
    if leaf not in node:
        raise KeyError(f"leaf {leaf} not found at {path} (have {list(node)})")
    expect = np.asarray(node[leaf]).shape
    if tuple(value.shape) != tuple(expect):
        raise ValueError(f"shape mismatch at {path}/{leaf}: "
                         f"checkpoint {value.shape} vs model {expect}")
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def import_state_dict(state_dict: Dict[str, np.ndarray], params: dict,
                      batch_stats: dict, mapping) -> Tuple[dict, dict]:
    """Apply a (torch_prefix, flax_path, kind) mapping; returns new
    (params, batch_stats) trees (copies)."""
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    for torch_prefix, flax_path, kind in mapping:
        if kind == "dense":
            w = state_dict[f"{torch_prefix}.weight"]
            w = w.reshape(w.shape[0], w.shape[1])  # drop trailing 1x(1) conv dims
            _set(params, flax_path, "kernel", w.T)
            if f"{torch_prefix}.bias" in state_dict:
                _set(params, flax_path, "bias",
                     state_dict[f"{torch_prefix}.bias"])
        elif kind == "conv3d":
            w = state_dict[f"{torch_prefix}.weight"]
            _set(params, flax_path, "kernel", np.transpose(w, (2, 3, 4, 1, 0)))
            _set(params, flax_path, "bias", state_dict[f"{torch_prefix}.bias"])
        elif kind == "bn":
            _set(params, flax_path, "scale",
                 state_dict[f"{torch_prefix}.weight"])
            _set(params, flax_path, "bias", state_dict[f"{torch_prefix}.bias"])
            _set(batch_stats, flax_path, "mean",
                 state_dict[f"{torch_prefix}.running_mean"])
            _set(batch_stats, flax_path, "var",
                 state_dict[f"{torch_prefix}.running_var"])
        else:
            raise ValueError(kind)
    return params, batch_stats


# ---- CLI glue ----------------------------------------------------------------

def mapping_for_model(model, params) -> List[Tuple[str, str, str]]:
    """Pick the released-checkpoint mapping for a model instance.

    Used by the evaluators' extension dispatch (`--evaluate` on a reference
    `.pth.tar`, reference README.md:129-147). `params` (the model's flax
    parameter tree) disambiguates the Frustum variants, which share the
    FrustumNet class (models/kitti/frustum/frustum_net.py:94-160).
    """
    name = type(model).__name__
    mod = getattr(type(model), "__module__", "")
    if name == "PVCNN":
        return (pvcnn_shapenet_mapping() if "shapenet" in mod
                else pvcnn_s3dis_mapping())
    if name == "PVCNN2":
        return pvcnn2_s3dis_mapping()
    if name == "PointNet":
        if "shapenet" in mod:
            return pointnet_shapenet_mapping(
                with_transformer=bool(getattr(model, "with_transformer",
                                              False)))
        return pointnet_s3dis_mapping()
    if name == "PointNet2SSG":
        return pointnet2_shapenet_mapping(msg=False)
    if name == "PointNet2MSG":
        return pointnet2_shapenet_mapping(msg=True)
    if name == "FrustumNet":
        if "InstanceSegmentationPointNet2_0" in params:
            return frustum_mapping("pointnet2")
        seg = params.get("InstanceSegmentationNet_0", {})
        has_pvconv = any(k.startswith("PVConv") for k in seg)
        return frustum_mapping("pvcnne" if has_pvconv else "pointnet")
    raise ValueError(
        f"no released-checkpoint mapping for model class {name!r}; "
        "supported: PVCNN/PVCNN2/PointNet/PointNet2SSG/PointNet2MSG/"
        "FrustumNet")


def import_torch_checkpoint(path: str, state, model):
    """Load a reference `.pth.tar` into a TrainState (params + batch_stats
    replaced; optimizer state/epoch untouched)."""
    import flax
    import jax.numpy as jnp

    params = flax.core.unfreeze(state.params)
    batch_stats = flax.core.unfreeze(state.batch_stats)
    state_dict = load_torch_state_dict(path)
    mapping = mapping_for_model(model, params)
    params, batch_stats = import_state_dict(state_dict, params, batch_stats,
                                            mapping)
    import jax
    to_dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return state.replace(params=to_dev(params),
                         batch_stats=to_dev(batch_stats))
