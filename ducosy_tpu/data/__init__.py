from ducosy_tpu.data.dataset import SlicePairDataset  # noqa: F401
from ducosy_tpu.data.loader import HostLoader  # noqa: F401
from ducosy_tpu.data.pairing import (  # noqa: F401
    list_patient_dirs,
    pair_patient_slices,
    sort_dicom_files,
    train_val_split,
)
