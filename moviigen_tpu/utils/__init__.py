from .io import cache_video, cache_image, str2bool, rand_name

__all__ = ["cache_video", "cache_image", "str2bool", "rand_name"]
