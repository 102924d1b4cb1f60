"""Host-side data pipeline (PIL/cv2 numerics preserved for parity).

Produces NHWC float32 numpy batches; device transfer happens in the trainer.
"""

from michigan_tpu.data.transforms import get_params, get_transform, TransformSpec
from michigan_tpu.data.preprocess import (
    pad_zeros,
    trans_orient_to_rgb,
    generate_hole,
)
from michigan_tpu.data.single import single_inference_data, demo_inference_data
from michigan_tpu.data.dataset import CustomDataset, create_dataloader
