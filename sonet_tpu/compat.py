"""Reference-checkpoint import: torch ``.pth`` state_dicts -> flax params.

The reference saves each sub-network's bare ``state_dict()`` to
``<epoch>_net_<label>.pth`` (models/classifier.py:127-133; labels
``encoder`` / ``classifier`` / ``segmenter`` / ``decoder``), and its
deployment story is re-loading those files inside the training code
(shrec16/test.py:31-32).  This module lets a reference user carry those
trained weights over: it converts the ``.pth`` files into this
package's parameter tree — purely key-driven, no reference code or GPU
needed — and :func:`import_run` writes a standard run directory
(``config.json`` + ``ckpt/``) that every entry point here accepts
(tasks/infer.py, tasks/serve.py, tasks/export.py, ``--pretrain``
transfer, resumed training).  The inverse direction also exists:
:func:`export_reference_checkpoint` writes a finished run back out as
reference-loadable ``.pth`` files (encoder loads with ``strict=False``
— the dead ``transformer`` sub-network has no weights here).

Layout mapping (pinned numerically by tests/test_parity.py's
weight-transplant parity suite; tests/test_compat.py checks this module
produces the identical trees from saved ``.pth`` files):

==========================  =============================================
torch state_dict key        flax tree path
==========================  =============================================
``<net>.layers.{i}.conv.weight``  ``<net>.PointLayer_{i}.Dense_0.kernel``
  (Cout, Cin, 1[, 1]) 1x1 conv      reshaped to (Cin, Cout)
``<net>.layers.{i}.linear.weight``  same, transposed
``....norm.{weight,bias}``  ``....BatchNorm_0.{scale,bias}``
``....norm.running_*``      batch_stats ``....BatchNorm_0.{mean,var}``
``fc_decoder.linear_out.*``  ``decoder.fc_decoder.linear_out.*``
``conv_decoder.deconv{n}.conv.*``   ``conv_decoder.UpConv_{n-1}.Conv_0``
  (Cout, Cin, 3, 3)                   kernel transposed to (3, 3, Cin, Cout)
``conv_decoder.conv2pc{j}.conv1.*`` ``conv_decoder.ConvToPC_{j-4}.PointLayer_0``
``conv_decoder.conv2pc{j}.conv2.*`` ``conv_decoder.ConvToPC_{j-4}.Dense_0``
``transformer.*``            dropped (dead code, networks.py:147-164)
``*.num_batches_tracked``    dropped (epoch-driven momentum here)
==========================  =============================================
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .config import Config

Tree = Dict[str, Any]

_TASK_HEADS = {"classify": "classifier", "retrieve": "classifier",
               "segment": "segmenter", "autoencode": "decoder"}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` state_dict into plain numpy arrays."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is in this image
        raise ImportError(
            "importing reference checkpoints needs torch (CPU build is "
            "enough) to deserialize .pth files") from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue  # torch BN step counter; momentum here is epoch-driven
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def _group(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Sub-dict of keys under ``prefix.``, prefix stripped."""
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _bn_tree(g: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """torch ``norm.*`` keys -> BatchNorm {params, batch_stats} leaves."""
    return ({"scale": g["norm.weight"], "bias": g["norm.bias"]},
            {"mean": g["norm.running_mean"], "var": g["norm.running_var"]})


def _point_layer(g: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """One EquivariantLayer / MyConv2d / MyLinear block -> PointLayer
    subtree.  1x1 convs (layers.py:243-296) flatten to a dense kernel;
    torch Dense weights are (out, in) -> transpose."""
    if "conv.weight" in g:
        w = g["conv.weight"]  # (Cout, Cin, 1[, 1])
        kernel = w.reshape(w.shape[0], w.shape[1]).T
        bias = g["conv.bias"]
    elif "linear.weight" in g:
        kernel = g["linear.weight"].T
        bias = g["linear.bias"]
    else:
        raise ValueError(f"unrecognized layer block (keys {sorted(g)}); "
                         "expected conv.weight or linear.weight")
    params: Tree = {"Dense_0": {"kernel": kernel, "bias": bias}}
    stats: Tree = {}
    if "norm.weight" in g:
        params["BatchNorm_0"], stats["BatchNorm_0"] = _bn_tree(g)
    return params, stats


def _layer_stack(g: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """A PointNet/PointResNet/KNNModule ``layers`` ModuleList ->
    ``PointLayer_{i}`` subtrees."""
    idx = sorted({int(k.split(".")[1]) for k in g if k.startswith("layers.")})
    params, stats = {}, {}
    for i in idx:
        p, s = _point_layer(_group(g, f"layers.{i}"))
        params[f"PointLayer_{i}"] = p
        if s:
            stats[f"PointLayer_{i}"] = s
    return params, stats


def convert_encoder(sd: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """``<epoch>_net_encoder.pth`` -> Encoder {params, batch_stats}.

    Sub-networks (networks.py:80-98): first_pointnet (PointResNet),
    knnlayer (KNNModule, som_k >= 2 only), final_pointnet.  The dead
    ``transformer`` weights are dropped."""
    params, stats = {}, {}
    for sub in ("first_pointnet", "knnlayer", "final_pointnet"):
        g = _group(sd, sub)
        if not g:
            continue
        p, s = _layer_stack(g)
        params[sub] = p
        if s:
            stats[sub] = s
    if "first_pointnet" not in params or "final_pointnet" not in params:
        raise ValueError(
            "not an encoder state_dict (missing first_pointnet/"
            f"final_pointnet; top-level keys: "
            f"{sorted({k.split('.')[0] for k in sd})})")
    return params, stats


def convert_classifier(sd: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """``_net_classifier.pth`` -> ClassifierHead tree (fc1/fc2 with BN,
    fc3 bare; networks.py:202-227)."""
    params, stats = {}, {}
    for name in ("fc1", "fc2", "fc3"):
        g = _group(sd, name)
        if not g:
            raise ValueError(f"not a classifier state_dict (missing {name})")
        p, s = _point_layer(g)
        params[name] = p
        if s:
            stats[name] = s
    return params, stats


def convert_segmenter(sd: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """``_net_segmenter.pth`` -> SegmenterHead tree (layer1..layer5;
    networks.py:296-344)."""
    params, stats = {}, {}
    for i in range(1, 6):
        g = _group(sd, f"layer{i}")
        if not g:
            raise ValueError(
                f"not a segmenter state_dict (missing layer{i})")
        p, s = _point_layer(g)
        params[f"layer{i}"] = p
        if s:
            stats[f"layer{i}"] = s
    return params, stats


def convert_decoder(sd: Dict[str, np.ndarray]) -> Tuple[Tree, Tree]:
    """``_net_decoder.pth`` -> Decoder tree (fc_decoder linear pyramid +
    conv_decoder UpConv/ConvToPC pyramid; networks.py:347-462)."""
    params, stats = {}, {}
    fc = _group(sd, "fc_decoder")
    if fc:
        fp, fs = {}, {}
        for i, name in enumerate(("linear1", "linear2", "linear3")):
            p, s = _point_layer(_group(fc, name))
            fp[f"PointLayer_{i}"] = p
            if s:
                fs[f"PointLayer_{i}"] = s
        fp["linear_out"] = {"kernel": fc["linear_out.linear.weight"].T,
                            "bias": fc["linear_out.linear.bias"]}
        params["fc_decoder"] = fp
        if fs:
            stats["fc_decoder"] = fs
    conv = _group(sd, "conv_decoder")
    if conv:
        cp, cs = {}, {}
        for n in range(1, 7):
            g = _group(conv, f"deconv{n}.conv")  # UpConv.conv = MyConv2d
            w = g["conv.weight"]                 # (Cout, Cin, 3, 3)
            bn_p, bn_s = _bn_tree(g)
            cp[f"UpConv_{n - 1}"] = {
                "Conv_0": {"kernel": w.transpose(2, 3, 1, 0),
                           "bias": g["conv.bias"]},
                "BatchNorm_0": bn_p}
            cs[f"UpConv_{n - 1}"] = {"BatchNorm_0": bn_s}
        for j in (4, 5, 6):
            g = _group(conv, f"conv2pc{j}")
            p1, s1 = _point_layer(_group(g, "conv1"))
            w2 = g["conv2.conv.weight"]          # (3, Cin, 1, 1)
            cp[f"ConvToPC_{j - 4}"] = {
                "PointLayer_0": p1,
                "Dense_0": {"kernel": w2.reshape(3, -1).T,
                            "bias": g["conv2.conv.bias"]}}
            cs[f"ConvToPC_{j - 4}"] = {"PointLayer_0": s1}
        params["conv_decoder"] = cp
        stats["conv_decoder"] = cs
    if not params:
        raise ValueError(
            "not a decoder state_dict (no fc_decoder/conv_decoder; "
            f"top-level keys: {sorted({k.split('.')[0] for k in sd})})")
    return params, stats


_CONVERTERS = {"encoder": convert_encoder, "classifier": convert_classifier,
               "segmenter": convert_segmenter, "decoder": convert_decoder}


def _check_against_model(cfg: Config, params: Tree, stats: Tree) -> None:
    """Validate the imported tree against a freshly-initialized model of
    ``cfg``: identical structure and leaf shapes, or a readable error
    naming every mismatch (the reference would throw a bare
    load_state_dict size error)."""
    import jax
    import jax.numpy as jnp

    from .models import build_model
    from .serving import input_signature

    model = build_model(cfg)
    example = tuple(jnp.zeros(s, d) for _, s, d in input_signature(cfg))
    ref_vars = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *example, train=False))

    def flat(tree):
        return {jax.tree_util.keystr(k): tuple(v.shape) for k, v in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    problems = []
    for name, got_tree in (("params", params), ("batch_stats", stats)):
        want = flat(ref_vars.get(name, {}))
        got = flat(got_tree)
        for k in sorted(set(want) | set(got)):
            if k not in got:
                problems.append(f"{name}{k}: missing from checkpoint "
                                f"(model wants {want[k]})")
            elif k not in want:
                problems.append(f"{name}{k}: not in the {cfg.task} model "
                                f"(checkpoint has {got[k]})")
            elif want[k] != got[k]:
                problems.append(f"{name}{k}: shape {got[k]} != model's "
                                f"{want[k]}")
    if problems:
        raise ValueError(
            f"imported checkpoint does not fit the '{cfg.task}' model "
            f"config (check classes/som_k/surface_normal/feature_num/"
            f"output_*_pc_num):\n  " + "\n  ".join(problems))


def import_reference_checkpoint(cfg: Config,
                                files: Dict[str, str]) -> Dict[str, Tree]:
    """Convert reference ``.pth`` files into model variables for ``cfg``.

    ``files`` maps sub-network label -> path: ``encoder`` plus the
    task's head (``classifier`` / ``segmenter`` / ``decoder``).  Returns
    ``{"params": ..., "batch_stats": ...}`` matching
    ``build_model(cfg).init`` exactly (structure and shapes validated).
    """
    head = _TASK_HEADS[cfg.task]
    missing = [n for n in ("encoder", head) if n not in files]
    if missing:
        raise ValueError(f"task '{cfg.task}' needs state_dicts for "
                         f"{['encoder', head]}; missing {missing}")
    extra = sorted(set(files) - {"encoder", head})
    if extra:
        raise ValueError(f"unexpected sub-networks {extra} for task "
                         f"'{cfg.task}' (want encoder + {head})")
    params, stats = {}, {}
    for label, path in files.items():
        p, s = _CONVERTERS[label](load_state_dict(path))
        params[label] = p
        if s:
            stats[label] = s
    _check_against_model(cfg, params, stats)
    return {"params": params, "batch_stats": stats}


def _inv_bn(bn_p: Tree, bn_s: Tree, prefix: str) -> Dict[str, np.ndarray]:
    """BatchNorm {params, batch_stats} leaves -> flat torch ``norm.*``
    keys (num_batches_tracked synthesized: momentum here is
    epoch-driven)."""
    return {f"{prefix}norm.weight": np.asarray(bn_p["scale"], np.float32),
            f"{prefix}norm.bias": np.asarray(bn_p["bias"], np.float32),
            f"{prefix}norm.running_mean": np.asarray(bn_s["mean"],
                                                     np.float32),
            f"{prefix}norm.running_var": np.asarray(bn_s["var"], np.float32),
            f"{prefix}norm.num_batches_tracked": np.asarray(0, np.int64)}


def _inv_point_layer(p: Tree, s: Optional[Tree], kind: str,
                     prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`_point_layer`: PointLayer subtree -> flat torch
    keys.  ``kind``: conv1d (EquivariantLayer, layers.py:252), conv2d
    (MyConv2d, layers.py:175), linear (MyLinear, layers.py:129)."""
    out = {}
    k = np.asarray(p["Dense_0"]["kernel"], np.float32)  # (Cin, Cout)
    b = np.asarray(p["Dense_0"]["bias"], np.float32)
    if kind == "conv1d":
        out[f"{prefix}conv.weight"] = np.ascontiguousarray(k.T[:, :, None])
        out[f"{prefix}conv.bias"] = b
    elif kind == "conv2d":
        out[f"{prefix}conv.weight"] = np.ascontiguousarray(
            k.T[:, :, None, None])
        out[f"{prefix}conv.bias"] = b
    else:
        out[f"{prefix}linear.weight"] = np.ascontiguousarray(k.T)
        out[f"{prefix}linear.bias"] = b
    if "BatchNorm_0" in p:
        out.update(_inv_bn(p["BatchNorm_0"], (s or {})["BatchNorm_0"],
                           prefix))
    return out


def _inv_stack(p: Tree, s: Optional[Tree], kind: str,
               prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    for i in sorted(int(n.split("_")[1]) for n in p):
        name = f"PointLayer_{i}"
        out.update(_inv_point_layer(p[name], (s or {}).get(name), kind,
                                    f"{prefix}layers.{i}."))
    return out


def encoder_state_dict(params: Tree, stats: Tree) -> Dict[str, np.ndarray]:
    """Encoder tree -> reference-module state_dict arrays.

    The dead ``transformer`` sub-network has no counterpart here; load
    the result with ``strict=False`` (its weights are never used,
    networks.py:147-164)."""
    kinds = {"first_pointnet": "conv1d", "knnlayer": "conv2d",
             "final_pointnet": "conv1d"}
    out = {}
    for sub in ("first_pointnet", "knnlayer", "final_pointnet"):
        if sub in params:
            out.update(_inv_stack(params[sub], stats.get(sub), kinds[sub],
                                  f"{sub}."))
    return out


def classifier_state_dict(params: Tree, stats: Tree) -> Dict[str, np.ndarray]:
    out = {}
    for name in ("fc1", "fc2", "fc3"):
        out.update(_inv_point_layer(params[name], stats.get(name), "linear",
                                    f"{name}."))
    return out


def segmenter_state_dict(params: Tree, stats: Tree) -> Dict[str, np.ndarray]:
    out = {}
    for i in range(1, 6):
        out.update(_inv_point_layer(params[f"layer{i}"],
                                    stats.get(f"layer{i}"), "conv1d",
                                    f"layer{i}."))
    return out


def decoder_state_dict(params: Tree, stats: Tree) -> Dict[str, np.ndarray]:
    out = {}
    if "fc_decoder" in params:
        fp, fs = params["fc_decoder"], stats.get("fc_decoder", {})
        for i, name in enumerate(("linear1", "linear2", "linear3")):
            out.update(_inv_point_layer(fp[f"PointLayer_{i}"],
                                        fs.get(f"PointLayer_{i}"), "linear",
                                        f"fc_decoder.{name}."))
        out["fc_decoder.linear_out.linear.weight"] = np.ascontiguousarray(
            np.asarray(fp["linear_out"]["kernel"], np.float32).T)
        out["fc_decoder.linear_out.linear.bias"] = np.asarray(
            fp["linear_out"]["bias"], np.float32)
    if "conv_decoder" in params:
        cp, cs = params["conv_decoder"], stats.get("conv_decoder", {})
        for n in range(1, 7):
            up, us = cp[f"UpConv_{n - 1}"], cs.get(f"UpConv_{n - 1}", {})
            w = np.asarray(up["Conv_0"]["kernel"], np.float32)  # (3,3,Ci,Co)
            pre = f"conv_decoder.deconv{n}.conv."
            out[f"{pre}conv.weight"] = np.ascontiguousarray(
                w.transpose(3, 2, 0, 1))
            out[f"{pre}conv.bias"] = np.asarray(up["Conv_0"]["bias"],
                                                np.float32)
            out.update(_inv_bn(up["BatchNorm_0"], us["BatchNorm_0"], pre))
        for j in (4, 5, 6):
            tp = cp[f"ConvToPC_{j - 4}"]
            ts = cs.get(f"ConvToPC_{j - 4}", {})
            pre = f"conv_decoder.conv2pc{j}."
            out.update(_inv_point_layer(tp["PointLayer_0"],
                                        ts.get("PointLayer_0"), "conv2d",
                                        f"{pre}conv1."))
            k = np.asarray(tp["Dense_0"]["kernel"], np.float32)  # (Cin, 3)
            out[f"{pre}conv2.conv.weight"] = np.ascontiguousarray(
                k.T[:, :, None, None])
            out[f"{pre}conv2.conv.bias"] = np.asarray(tp["Dense_0"]["bias"],
                                                      np.float32)
    return out


_EXPORTERS = {"encoder": encoder_state_dict,
              "classifier": classifier_state_dict,
              "segmenter": segmenter_state_dict,
              "decoder": decoder_state_dict}


def export_reference_checkpoint(run_dir: str, out_dir: Optional[str] = None,
                                checkpoint: Optional[str] = None
                                ) -> Dict[str, str]:
    """Inverse migration: a sonet_tpu run -> reference-loadable ``.pth``.

    Writes ``<step>_net_<label>.pth`` per sub-network in the exact
    format ``save_network`` produces (classifier.py:127-133).  Load the
    encoder file into the reference with ``strict=False`` — the dead
    ``transformer`` sub-network has no weights here (networks.py:78,
    147-164); everything the forward pass reads is present.  Returns
    ``{label: path}``."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError("exporting .pth files needs torch") from e

    from . import train
    from .config import load_config
    from .models import build_model

    import jax
    import jax.numpy as jnp

    from .serving import input_signature

    cfg = load_config(os.path.join(run_dir, "config.json"))
    cfg = cfg.replace(mesh_shape=(1, 1))
    model = build_model(cfg)
    example = tuple(jnp.zeros(s, d) for _, s, d in input_signature(cfg))
    state = train.init_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                             example)
    ckpt = checkpoint or train.latest_checkpoint(os.path.join(run_dir,
                                                              "ckpt"))
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint found under {run_dir}/ckpt")
    state = train.restore_checkpoint(ckpt, state)
    step = int(state.step)

    out_dir = out_dir or os.path.join(run_dir, "reference_export")
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for label, p in state.params.items():
        s = (state.batch_stats or {}).get(label, {})
        arrays = _EXPORTERS[label](
            jax.tree_util.tree_map(np.asarray, p),
            jax.tree_util.tree_map(np.asarray, s))
        # copy: jax buffers are non-writable and torch tensors alias
        sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in arrays.items()}
        path = os.path.join(out_dir, f"{step}_net_{label}.pth")
        torch.save(sd, path)
        paths[label] = path
    return paths


def import_run(cfg: Config, files: Dict[str, str], out_dir: str,
               step: int = 0) -> str:
    """Write a standard run directory from reference ``.pth`` files.

    Produces ``out_dir/config.json`` + ``out_dir/ckpt/step_*`` exactly
    as ``Trainer`` would (fresh optimizer state at ``step``), so the
    result drives tasks/infer.py, tasks/serve.py, tasks/export.py,
    ``--pretrain`` encoder transfer, and resumed training unchanged.
    Returns the checkpoint path."""
    import jax
    import jax.numpy as jnp

    from . import train
    from .models import build_model
    from .serving import input_signature

    variables = import_reference_checkpoint(cfg, files)
    model = build_model(cfg)
    example = tuple(jnp.zeros(s, d) for _, s, d in input_signature(cfg))
    state = train.init_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                             example)
    as_f32 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float32), t)
    state = state.replace(params=as_f32(variables["params"]),
                          batch_stats=as_f32(variables["batch_stats"]),
                          # payload step must match the dir name, or a
                          # post-import training save at step < N sorts
                          # below it and auto-resume regresses forever
                          step=jnp.asarray(step, jnp.asarray(
                              state.step).dtype))
    os.makedirs(out_dir, exist_ok=True)
    cfg.save(os.path.join(out_dir, "config.json"))
    return train.save_checkpoint(os.path.join(out_dir, "ckpt"), state, step)
