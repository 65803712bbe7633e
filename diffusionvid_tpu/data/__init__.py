from .vid_dataset import (
    VIDDataset, FrameAnno, parse_vid_xml, pad_groundtruth,
    VID_CLASSES, VID_WNIDS, WNID_TO_LABEL,
)
from .transforms import (
    resize_scale, resize_image, pad_to, transform_frame, frame_bucket,
    bucket_shape,
)
from .sampling import (
    SampleConfig, build_train_sample, train_sample_stream, iter_test_videos,
    VideoChunks, ConcatDataset,
)
from .catalog import get_dataset, DATASETS
from .samplers import aspect_ratio_group_ids, grouped_batches
from .coco_voc import COCODataset, VOCDataset, evaluate_still
from .prefetch import PrefetchIterator, prefetch_map

__all__ = [
    "VIDDataset", "FrameAnno", "parse_vid_xml", "pad_groundtruth",
    "VID_CLASSES", "VID_WNIDS", "WNID_TO_LABEL",
    "resize_scale", "resize_image", "pad_to", "transform_frame",
    "frame_bucket", "bucket_shape",
    "SampleConfig", "build_train_sample", "train_sample_stream",
    "iter_test_videos", "VideoChunks", "ConcatDataset",
    "get_dataset", "DATASETS",
    "aspect_ratio_group_ids", "grouped_batches",
    "COCODataset", "VOCDataset", "evaluate_still",
    "PrefetchIterator", "prefetch_map",
]
