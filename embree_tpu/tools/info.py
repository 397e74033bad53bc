"""embree_info analog: print build/runtime/device information.

Mirrors the reference's `embree_info` tool (tutorials/embree_info): version,
device configuration, feature-support properties, and the TPU specifics that
replace the reference's CPU/ISA report (platform, device kind/count, VMEM
residency budget for the traversal kernel, native builder availability).

Usage: python -m embree_tpu.tools.info [--config "verbose=1,..."] [--cpu]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="device config string (rtcNewDevice analog)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import embree_tpu as et
    from embree_tpu.accel import traverse_pallas as tp
    from embree_tpu.rtcore import Device

    dev = Device(args.config)
    d0 = jax.devices()[0]
    print(f"embree_tpu v{et.__version__}")
    print(f"  platform            : {d0.platform} ({d0.device_kind})")
    print(f"  devices             : {len(jax.devices())} "
          f"(local {len(jax.local_devices())}, "
          f"processes {jax.process_count()})")
    print(f"  config              : {dev.config}")
    print("traversal kernel")
    print(f"  rays/program        : {tp.UGRP * tp.LANE} "
          f"({tp.UGRP} groups x {tp.LANE} lanes)")
    print(f"  stack capacity      : {8 * tp.STACK_BLOCKS} refs/ray")
    print(f"  VMEM residency      : {tp.VMEM_RESIDENT_BUDGET >> 20} MiB "
          f"(tables beyond it stream from HBM)")
    try:
        from embree_tpu.native import native_available
        nat = native_available()
    except Exception:
        nat = False
    print(f"  native C++ builder  : {'available' if nat else 'unavailable'}")
    print("properties (rtcGetDeviceProperty analog)")
    for name in ("version", "triangle_geometry_supported",
                 "quad_geometry_supported", "curve_geometry_supported",
                 "point_geometry_supported", "user_geometry_supported",
                 "subdivision_geometry_supported", "ray_mask_supported",
                 "filter_function_supported", "max_instance_level_count"):
        print(f"  {name:34s}: {dev.get_property(name)}")


if __name__ == "__main__":
    main()
