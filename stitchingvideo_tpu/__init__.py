"""stitchingvideo_tpu — TPU-native 360° multi-camera video stitching.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
wangzjpku/StitchingVideo (OpenCV-2.4.11 cv::Stitcher real-time wrapper):
registration (features → matching → RANSAC → rotation estimation → bundle
adjustment → wave correction), photometric compensation, seam finding,
feather/multi-band blending, and a cached-LUT streaming video compositor.

Public API mirrors the reference's two-phase split
(estimateTransform / composePanorama, reference src/stitcher.cpp:91-334).
"""

from .config import (ComposeConfig, FeatureConfig, MatchConfig, ParallelConfig,
                     RegistrationConfig, ScaleConfig, StitchConfig,
                     UndistortConfig, VideoConfig, cli_default_config)
from .models.camera import Cameras
from .models.registration import Registration
from .models.stitcher import Stitcher
from .video.lut import CompositeLUT, build_lut, composite_frame, composite_frame_u8
from .video.runtime import VideoStitcher
from .video.sources import (DirectorySource, FrameSource, ReplaySource,
                            SharedMemorySource, SyntheticSource, VideoFileSource)

__version__ = "0.1.0"

__all__ = [
    "Cameras", "CompositeLUT", "ComposeConfig", "DirectorySource",
    "FeatureConfig", "FrameSource", "MatchConfig", "ParallelConfig",
    "Registration", "RegistrationConfig", "ReplaySource", "ScaleConfig",
    "SharedMemorySource", "StitchConfig", "Stitcher", "SyntheticSource",
    "UndistortConfig", "VideoConfig", "VideoFileSource", "VideoStitcher",
    "build_lut", "cli_default_config", "composite_frame", "composite_frame_u8",
]
