"""RGB-D sequence data layer (production side of the reference's dataset/)."""

from .base import FrameData, FrameIntrinsic, RGBDSequence  # noqa: F401
