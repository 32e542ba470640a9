from ducosy_tpu.dicom.codec import Dataset, dcmread, dcmwrite  # noqa: F401
