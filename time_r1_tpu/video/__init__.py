from .decoder import VideoReader
from .pipeline import fetch_video, video_loader

__all__ = ["VideoReader", "fetch_video", "video_loader"]
