"""PccAppColorConverter equivalent: direct access to the color converter.

Reference: source/app/PccAppColorConverter/PccAppColorConverter.cpp:104.

Usage:
    python -m vpcc_tpu.apps.color_converter rgb2ycc in.npy out.npy [--f420=1]
    python -m vpcc_tpu.apps.color_converter ycc2rgb in.npy out.npy [--f420=1]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.video import color


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    pos = [a for a in args if not a.startswith("--")]
    cfg = VPCCConfig.from_args(args)
    if len(pos) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    mode, inp, outp = pos[:3]
    use420 = cfg.extra.get("f420", "0") == "1"
    # selectable chroma resampling filter banks (reference
    # g_filter444to420/g_filter420to444 indexes; 0 = F0 default)
    dfilt = int(cfg.extra.get("downsampleFilter", "0"))
    ufilt = int(cfg.extra.get("upsampleFilter", "0"))
    x = np.load(inp)
    if mode == "rgb2ycc":
        ycc = color.rgb_to_ycbcr(jnp.asarray(x))
        if use420:
            y = np.asarray(ycc[..., 0])
            if dfilt == 0:
                cb = np.asarray(color.downsample_420(ycc[..., 1]))
                cr = np.asarray(color.downsample_420(ycc[..., 2]))
            else:
                cb = color.downsample_420_filter(np.asarray(ycc[..., 1]), dfilt)
                cr = color.downsample_420_filter(np.asarray(ycc[..., 2]), dfilt)
            np.savez(outp, y=y, cb=cb, cr=cr)
        else:
            np.save(outp, np.asarray(ycc))
    elif mode == "ycc2rgb":
        if inp.endswith(".npz"):
            z = np.load(inp)
            if ufilt == 0:
                up = lambda p: color.upsample_420(jnp.asarray(p))
            else:
                up = lambda p: jnp.asarray(
                    color.upsample_420_filter(np.asarray(p), ufilt)
                )
            ycc = jnp.stack(
                [jnp.asarray(z["y"]), up(z["cb"]), up(z["cr"])], axis=-1
            )
        else:
            ycc = jnp.asarray(np.load(inp))
        np.save(outp, np.asarray(color.ycbcr_to_rgb(ycc)))
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 1
    print(f"{mode}: {inp} -> {outp}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
