from .video_reader import read_video_frames, probe_video
from .t2v_dataset import T2VDataset, filter_resolution, TemporalRandomCrop
from . import transforms

__all__ = [
    "read_video_frames",
    "probe_video",
    "T2VDataset",
    "filter_resolution",
    "TemporalRandomCrop",
    "transforms",
]
