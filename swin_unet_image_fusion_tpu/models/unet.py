"""SwinFusionUNet — 5-stage dual-stream Swin U-Net for IR/visible fusion.

TPU-first re-design of the reference's ``MyModel``
(``/root/reference/a013_ModelDefinition.py:17-230``):

- both modality streams ride a stacked leading axis (S=2) instead of duplicated module
  trees; all per-stream weights are stacked (see ``layers.py``);
- per-stage pad/crop amounts come from the static :func:`make_plan` computed from Python
  int shapes at trace time — the reference's LIFO recorder stacks dissolve entirely;
- skip connections are *additive* (``x += history`` — a013:221-224), recorded after every
  encoder stage except the last (a013:219-220), preserved exactly;
- decoder stage order mirrors the encoder: blocks -> crop(window pad) -> anti-merge ->
  crop(merge pad) (a013:311-314 reverses the encoder list);
- decoder MLP hidden dims use ``in_dims_list[k] * ratio`` while the block dims are
  ``out_dims_list[k]`` — a reference quirk preserved (a013:196).

Layout: NHWC. Inputs ir/vis are (B, H, W, 1); output fused image is (B, H, W, 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.patch import (
    crop_bottom_right,
    crop_bottom_right_cmajor,
    pad_reflect_bottom_right,
    pad_reflect_bottom_right_cmajor,
)
from ..ops.shape_plan import make_plan
from .layers import (
    FinalHead,
    PackedPatchMergeLayer,
    PackedPatchUnmergeLayer,
    PatchMergeLayer,
    PatchUnmergeLayer,
    SelfAndCrossBlockPair,
    pack_beneficial,
)

STREAMS = 2  # dual path: (x=ir, y=vis_Y)


class SwinFusionUNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, ir: jnp.ndarray, vis: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        n = cfg.num_stages
        b, h, w, _ = ir.shape
        plan = make_plan(h, w, n, cfg.merging_size, cfg.window_size)

        deterministic = not train

        # optional rematerialisation: recompute each stage's 4 blocks on backward
        # instead of keeping activations (jax.checkpoint / nn.remat)
        block_cls = (
            nn.remat(SelfAndCrossBlockPair, static_argnums=(1,))  # `deterministic`
            if (cfg.remat and train)
            else SelfAndCrossBlockPair
        )

        attention_impl = cfg.resolved_attention_impl()  # "auto" -> backend choice

        # C-major trunk: under the pallas_pack impl the small-C stages run entirely
        # (S, B, C, H, W) — blocks AND the stage-boundary pad/merge/skip ops — so the
        # lane-padded NHWC buffers (C=1..96 padded to 128 lanes) never touch HBM.
        # pack_beneficial is the same predicate the block pair uses, evaluated at the
        # resolution its blocks will see (plan[k].att_hw).
        stage_cmajor = tuple(
            attention_impl.startswith("pallas_pack")
            and pack_beneficial(cfg.out_dims_list[k], plan[k].att_hw[1])
            for k in range(n)
        )

        def to_layout(a, cur: bool, want: bool):
            """Convert between NHWC (False) and C-major (True) stacked layouts."""
            if cur == want:
                return a
            return jnp.moveaxis(a, -1, 2) if want else jnp.moveaxis(a, 2, -1)

        def stage_blocks(k: int, role: str):
            dims = cfg.out_dims_list[k]
            # decoder quirk: mlp hidden follows the *output* dims of the decoder stage
            # (= in_dims_list[k]) — reference a013_ModelDefinition.py:196
            mlp_hidden = (
                cfg.out_dims_list[k] * cfg.mlp_hidden_dims_ratio
                if role == "enc"
                else cfg.in_dims_list[k] * cfg.mlp_hidden_dims_ratio
            )
            # deep tiny-map escape hatch: below the token threshold the jnp
            # composition beats the per-call NHWC kernel overhead (config knob,
            # measured — docs/ROADMAP.md). Interpret-mode impls are exempt: they
            # exist to exercise the kernel path in CPU tests, where the gate
            # would silently reroute coverage to jnp.
            stage_impl = attention_impl
            if (
                cfg.attention_jnp_max_tokens is not None
                and attention_impl.startswith("pallas")
                and not attention_impl.endswith("_interpret")
                and not stage_cmajor[k]
                and plan[k].att_hw[0] * plan[k].att_hw[1]
                <= cfg.attention_jnp_max_tokens
            ):
                stage_impl = "jnp"
            return block_cls(
                streams=STREAMS,
                dims=dims,
                num_heads=cfg.att_num_heads,
                dims_per_head=cfg.dims_per_head(dims),
                window_size=cfg.window_size,
                mlp_hidden_dims=mlp_hidden,
                activation=cfg.mlp_activation,
                use_qkv_bias=cfg.use_qkv_bias,
                attention_drop_ratio=cfg.attention_drop_ratio,
                proj_drop_ratio=cfg.linear_after_att_drop_ratio,
                mlp_drop_ratio=cfg.mlp_drop_ratio,
                dtype=dtype,
                impl=stage_impl,
                strips_io=stage_cmajor[k],
                strips_hw=plan[k].att_hw if stage_cmajor[k] else None,
                name=f"{role}{k}_blocks",
            )

        # cmajor stages run on packed strips end-to-end: the quartet is strips-in/
        # strips-out (normal geometry), and a boundary between two cmajor stages
        # runs patch merge / anti-merge directly in strip layout
        # (ops/packed_boundary.py) — no unpack/pack transpose chains between them.
        if any(stage_cmajor):
            from ..ops.pallas_pack import pack_windows_cmajor, unpack_windows_cmajor

        x = jnp.stack([ir, vis], axis=0).astype(dtype)  # (S, B, H, W, 1)
        layout = False  # NHWC
        strips = False  # packed normal strips over the current stage's att_hw

        # Packed trunk entry/exit: pack the RAW input map (C = in_dims_list[0],
        # usually 1) so stage 0 enters through PackedPatchMergeLayer and the
        # decoder leaves through PackedPatchUnmergeLayer — the classic stage-0
        # boundary chains (reflect pad / crop on the C-major maps + the
        # pack/unpack transposes at out_dims_list[0] channels) were the largest
        # remaining relayout-copy group at 512^2 bs=128 (docs/ROADMAP.md session
        # 11b). The entry transpose now moves in_dims/out_dims of the bytes.
        # PACKED_ENTRY=0 is the profiling kill-switch.
        import os as _os

        packed_entry = stage_cmajor[0] and _os.environ.get("PACKED_ENTRY", "1") != "0"
        if packed_entry:
            x = jnp.moveaxis(x, -1, 2)  # (S, B, C0, H, W); free when C0 == 1
            x, _ = pack_windows_cmajor(x.astype(dtype), cfg.window_size)
            layout, strips = True, True

        # ---------------- encoder ----------------
        skips = []
        for k in range(n):
            p = plan[k]
            if stage_cmajor[k] and strips:
                # packed boundary: reflect pads + merge + repack as one strip op
                x = PackedPatchMergeLayer(
                    streams=STREAMS,
                    in_dims=cfg.in_dims_list[k],
                    out_dims=cfg.out_dims_list[k],
                    window_size=cfg.window_size,
                    hw_src=p.in_hw,
                    pad_merge=p.pad_merge,
                    pad_win=p.pad_win,
                    activation=cfg.mlp_activation,
                    dtype=dtype,
                    name=f"enc{k}_merge",
                )(x)
            else:
                if strips:
                    x = unpack_windows_cmajor(x, cfg.window_size, p.in_hw)
                    layout, strips = True, False
                x = to_layout(x, layout, stage_cmajor[k])
                layout = stage_cmajor[k]
                pad = (
                    pad_reflect_bottom_right_cmajor if layout else pad_reflect_bottom_right
                )
                x = pad(x, p.pad_merge)
                x = PatchMergeLayer(
                    streams=STREAMS,
                    out_dims=cfg.out_dims_list[k],
                    merging_size=cfg.merging_size,
                    activation=cfg.mlp_activation,
                    dtype=dtype,
                    cmajor=layout,
                    name=f"enc{k}_merge",
                )(x)
                x = pad(x, p.pad_win)
                if stage_cmajor[k]:
                    x, _ = pack_windows_cmajor(x.astype(dtype), cfg.window_size)
            strips = stage_cmajor[k]
            x = stage_blocks(k, "enc")(x, deterministic=deterministic)
            if k < n - 1:
                skips.append(x)  # a013:219-220 — all but the last stage

        # ---------------- decoder ----------------
        for j in range(n):
            k = n - 1 - j  # mirrored encoder stage
            p = plan[k]
            if stage_cmajor[k] and not strips:
                x = to_layout(x, layout, True)
                x, _ = pack_windows_cmajor(x.astype(dtype), cfg.window_size)
                layout, strips = True, True
            elif not stage_cmajor[k] and (strips or layout):
                # also covers non-contiguous cmajor patterns (a packed stage ABOVE
                # this one left x in C-major map form after its unmerge)
                if strips:
                    x = unpack_windows_cmajor(x, cfg.window_size, p.att_hw)
                    strips = False
                x = to_layout(x, True, False)
                layout = False
            if j > 0:
                # additive skips, LIFO — a013:221-224; the popped skip comes from
                # encoder stage k, so it is in this stage's form by construction
                # (strips over the same normal geometry, or the same map layout)
                x = x + skips.pop()
            x = stage_blocks(k, "dec")(x, deterministic=deterministic)
            if strips and (
                (k > 0 and stage_cmajor[k - 1]) or (k == 0 and packed_entry)
            ):
                # packed boundary: undo-crops + anti-merge + repack as one strip op
                x = PackedPatchUnmergeLayer(
                    streams=STREAMS,
                    out_dims=cfg.in_dims_list[k],
                    window_size=cfg.window_size,
                    hw_dst=p.in_hw,
                    activation=cfg.mlp_activation,
                    dtype=dtype,
                    name=f"dec{k}_unmerge",
                )(x)
            else:
                if strips:
                    x = unpack_windows_cmajor(x, cfg.window_size, p.att_hw)
                    layout, strips = True, False
                crop = crop_bottom_right_cmajor if layout else crop_bottom_right
                x = crop(x, p.pad_win)
                x = PatchUnmergeLayer(
                    streams=STREAMS,
                    out_dims=cfg.in_dims_list[k],
                    merging_size=cfg.merging_size,
                    activation=cfg.mlp_activation,
                    dtype=dtype,
                    cmajor=layout,
                    name=f"dec{k}_unmerge",
                )(x)
                x = crop(x, p.pad_merge)

        # ---------------- final head ----------------
        if strips:
            # packed_entry left the trunk in C0 strips over the input map
            x = unpack_windows_cmajor(x, cfg.window_size, plan[0].in_hw)
            layout, strips = True, False
        x = to_layout(x, layout, False)  # NHWC for the conv head
        xy = jnp.concatenate([x[0], x[1]], axis=-1)  # (B, H, W, 2): [x_stream, y_stream]
        out = FinalHead(
            kernel_size=cfg.final_conv_layer_kernel_size,
            activation=cfg.mlp_activation,
            dtype=dtype,
            bn_axis_name=cfg.bn_axis_name or None,
            name="final_head",
        )(xy, train=train)
        return out.astype(jnp.float32)
