"""Compatibility shim: the synthetic scene generator moved into the package
(macaque_tpu/tools/synthetic.py) so the weight-free demo and the pipeline
benchmark can use it without importing test code."""

from macaque_tpu.tools.synthetic import *  # noqa: F401,F403
from macaque_tpu.tools.synthetic import (  # noqa: F401
    make_test_rig, make_skeleton_offsets, simulate_scene, project_scene,
    encode_index, decode_index, render_stores, SyntheticPerception,
)
