"""Host-side video I/O: imgstore-format reader/writer and PTP time-grid
alignment (the reference's video layer is the external ``imgstore``
package + per-frame cv2 reads; step1_proc2d.py:403-418)."""

from macaque_tpu.video.imgstore import ImgStoreReader, write_imgstore
from macaque_tpu.video.timegrid import align_time_grid

__all__ = ["ImgStoreReader", "write_imgstore", "align_time_grid"]
