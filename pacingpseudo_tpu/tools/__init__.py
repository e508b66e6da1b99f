from .scribbles import (
    skeletonize,
    generate_scribble,
    detect_endpoints,
    delete_endpoints,
)
from .medio import read_nifti, write_nifti, read_dicom, read_dicom_series
