"""Contrastive (CLIP-style) fine-tuning on a device mesh.

The reference has no training at all (SURVEY.md §2.4) — it consumes frozen
checkpoints. A production search deployment wants domain adaptation, so this
module adds the canonical dual-tower objective: symmetric InfoNCE over
image/text pairs with a learned temperature, as one jitted, mesh-sharded
train step.

Sharding (GSPMD style — annotate, let XLA place the collectives on ICI):
- batch: P("data") — data parallelism; the [B, B] logit matrix makes every
  pair a negative for every other, and XLA inserts the all-gather/psum the
  global matmul needs.
- params: replicated by default; with a >1 "model" axis the stacked MLP and
  attention projections shard column-/row-wise (Megatron-style tensor
  parallelism) via ``param_shardings`` — only needed for towers that
  outgrow a chip (ViT-bigG), ViT-L/14 fits comfortably.
- fsdp=True: ZeRO-3-style parameter/gradient/optimizer-state sharding over
  the data axis (per-layer all-gather inside the scanned tower) for when
  the OPTIMIZER state is what outgrows the chip; composes with TP.

No pipeline/sequence/expert parallelism: 24 layers of ViT-L/14 at seq 257
leave nothing for PP/SP/EP to win (SURVEY.md §5); the scaling axes here are
batch (data), optimizer memory (fsdp), width (model), corpus (index shards).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_search_tpu.config import CLIPConfig
from image_search_tpu.models import clip as model_lib
from image_search_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def clip_loss(img_emb: jax.Array, txt_emb: jax.Array, scale: jax.Array):
    """Symmetric InfoNCE over l2-normalized embeddings.

    Returns (loss, metrics). Labels are the diagonal: pair i matches pair i.
    """
    logits = scale * jnp.einsum(
        "bp,cp->bc", img_emb.astype(jnp.float32), txt_emb.astype(jnp.float32)
    )
    B = logits.shape[0]
    labels = jnp.arange(B)
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    loss = 0.5 * (li + lt)
    acc = (jnp.argmax(logits, axis=-1) == labels).mean()
    return loss, {"loss": loss, "img_to_txt_acc": acc, "logit_scale": scale}


def _tower_block_specs(tp: bool, fsdp: bool) -> Dict[str, P]:
    """PartitionSpecs for the stacked [L, ...] block params.

    tp: Megatron column/row split of the OUTPUT/INPUT feature dims over the
    model axis. fsdp: ZeRO-3-style shard of the remaining big weight dim
    over the data axis — each weight lives 1/N-th per device and GSPMD
    all-gathers it at its (per-layer, inside the scan) use site, then
    reduce-scatters its gradient; optimizer moments inherit the sharding,
    so optimizer memory also drops N-fold. The two composes: a [L, D, M]
    weight can be ("data" on D, "model" on M) simultaneously."""
    m = MODEL_AXIS if tp else None
    d = DATA_AXIS if fsdp else None
    rep2 = P(None, None)
    # qkv_w's fused last dim shards column-wise; GSPMD re-partitions at the
    # q/k/v split so correctness is layout-independent (verified equal to
    # the unsharded step in tests/test_train.py).
    return {
        "ln1_scale": rep2, "ln1_bias": rep2,
        "qkv_w": P(None, d, m), "qkv_b": P(None, m),
        "o_w": P(None, m, d), "o_b": rep2,
        "ln2_scale": rep2, "ln2_bias": rep2,
        "fc_w": P(None, d, m), "fc_b": P(None, m),
        "proj_w": P(None, m, d), "proj_b": rep2,
    }


# big non-block 2D params that pay FSDP sharding (biases/LN/pos-emb don't).
# token_embedding shards over D, not V: sharding the GATHER dim makes GSPMD
# produce the embedding gradient (model-axis-sharded by the first TP qkv
# matmul's backward) and then re-shard it onto data-over-V — a device-order
# transpose it can only do by "Involuntary full rematerialization"
# (replicate + repartition, wasted ICI every step; observed in the 4x2
# FSDP+TP dryrun, fixed round 3). D-sharding gives the same N-fold
# param/moment memory saving with a clean transform.
_FSDP_TOP_LEVEL = {
    "token_embedding": P(None, DATA_AXIS),  # [V, D] — the largest text param
    "patch_embedding": P(None, DATA_AXIS),  # [patch_dim, D]
    "projection": P(DATA_AXIS, None),  # [D, proj]
}


def param_shardings(params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree: TP on block matmuls when the model axis > 1,
    optional ZeRO-3-style FSDP over the data axis, else replicated."""
    rep = NamedSharding(mesh, P())
    tp = mesh.shape[MODEL_AXIS] > 1
    if not tp and not fsdp:
        return jax.tree.map(lambda _: rep, params)
    blk = _tower_block_specs(tp, fsdp)

    def assign(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "blocks" in names:
            return NamedSharding(mesh, blk[names[-1]])
        if fsdp and names[-1] in _FSDP_TOP_LEVEL:
            return NamedSharding(mesh, _FSDP_TOP_LEVEL[names[-1]])
        return rep

    return jax.tree_util.tree_map_with_path(assign, params)


def make_train_step(
    cfg: CLIPConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    fsdp: bool = False,
):
    """Returns (init_fn(params) -> state, step_fn(state, ids, pixels) ->
    (state, metrics)), jitted over the mesh.

    fsdp=True (requires a mesh) shards every big weight 1/N over the data
    axis (ZeRO-3): params, gradients (reduce-scattered) and optimizer
    moments all shrink N-fold per device, paying one per-layer all-gather
    inside the scanned tower — the standard memory/bandwidth trade for
    towers (ViT-bigG) whose optimizer state outgrows a chip. Composes with
    tensor parallelism on the model axis.

    remat=True recomputes block activations in the backward pass
    (jax.checkpoint over the scanned layers) — necessary for ViT-L/14
    fine-tuning at production batch sizes on 16 GB chips."""

    from image_search_tpu.models import get_model_module

    mod = get_model_module(cfg)  # clip | siglip

    if cfg.arch == "siglip":
        from image_search_tpu.models.siglip import sigmoid_loss

        def loss_fn(params, input_ids, pixels):
            img, txt, scale, bias = mod.forward(
                params, cfg, input_ids, pixels, compute_dtype=compute_dtype, remat=remat
            )
            loss = sigmoid_loss(img, txt, scale, bias)
            logits = scale * jnp.einsum("bp,cp->bc", img, txt) + bias
            acc = (jnp.argmax(logits, axis=-1) == jnp.arange(logits.shape[0])).mean()
            return loss, {"loss": loss, "img_to_txt_acc": acc, "logit_scale": scale}
    else:

        def loss_fn(params, input_ids, pixels):
            img, txt, scale = mod.forward(
                params, cfg, input_ids, pixels, compute_dtype=compute_dtype, remat=remat
            )
            return clip_loss(img, txt, scale)

    def step_fn(state: TrainState, input_ids, pixels):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, input_ids, pixels
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a device mesh")

    def init_fn(params) -> TrainState:
        if mesh is None:
            return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
        params = jax.device_put(params, param_shardings(params, mesh, fsdp=fsdp))
        opt_state = optimizer.init(params)
        # moments are zeros_like(sharded params) and inherit their mesh
        # placement, but SCALAR leaves (adam count, our step) land on one
        # default device — replicate them so the whole state shares the
        # mesh (a mixed-placement state breaks jit after an orbax restore,
        # caught by tests/test_train.py FSDP checkpoint roundtrip)
        rep = NamedSharding(mesh, P())

        def ensure_on_mesh(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return x
            return jax.device_put(x, rep)

        opt_state = jax.tree.map(ensure_on_mesh, opt_state)
        return TrainState(
            params, opt_state, jax.device_put(jnp.zeros((), jnp.int32), rep)
        )

    # Donating the state halves peak memory on TPU, but XLA:CPU's collective
    # runtime deadlocks (rendezvous timeout) when buffer donation is combined
    # with tensor-parallel shardings — observed on jax 0.9 with 8 virtual
    # devices. The virtual-CPU path exists only for tests/dryrun, so donation
    # is simply disabled there.
    platform = (mesh.devices.flat[0] if mesh is not None else jax.devices()[0]).platform
    donate = (0,) if platform != "cpu" else ()

    if mesh is None:
        return init_fn, jax.jit(step_fn, donate_argnums=donate)

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    jitted = jax.jit(
        step_fn,
        donate_argnums=donate,
        in_shardings=(None, batch_sh, batch_sh),
    )
    return init_fn, jitted
