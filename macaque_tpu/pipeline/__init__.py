"""Pipeline stages with the reference's on-disk artifact protocol.

Stages communicate only through files (SURVEY.md §2.4): alldata.json,
frame_num.npy, match_keyframe.pickle, track/collar_id/kp2d/kp2d_f/kp3d
pickles — so each stage is independently resumable and any stage of the
original pipeline can be swapped against this one.
"""

from macaque_tpu.pipeline.runner import run_pipeline
