"""rawphotoforge_tpu.io — image + RAW container codecs.

Public surface (each re-exported from its module):

* image_io: decode_image / encode_image / read_image / write_image
  (JPEG/PNG/WebP/TIFF/PPM16 <-> linear planar f32)
* dng: read_dng / write_dng / extract_preview / RawImage
* cr2: read_cr2
* raw: read_raw / parse_raw / is_raw_image / synthetic_raw
* ljpeg: ITU-T.81 lossless-JPEG codec (decode / encode)
* jpegenc: encode_jpeg — device-side DCT/quantization + sparse-coefficient
  fetch + native baseline-JPEG entropy coder (dense-YCbCr fallback)
* lensdb: LensDatabase (lensfun-XML profiles, EXIF auto-resolution)
"""

from .dng import RawImage, extract_preview, read_dng, write_dng  # noqa: F401
from .image_io import (  # noqa: F401
    decode_image, encode_image, read_image, write_image,
)
from .raw import (  # noqa: F401
    decode_embedded_preview, is_raw_image, parse_raw, read_raw,
)
