from .synthetic import SyntheticEpisodeSource
from .splits import SplitIndex, VideoRecord, load_split_lists
from .video import (VideoStore, ZipFrameStore, scan_frame_tree,
                    sample_frame_indices, load_clip)
from .features import FeatureStore, MultiModalFeatureStore, scan_feature_tree
from .episodes import (EpisodeSampler, EpisodeSpec, EpisodeMeta,
                       draw_episode_spec,
                       save_fixed_episodes, load_fixed_episodes,
                       load_reference_fixed_episodes,
                       save_reference_fixed_episodes)
from .prefetch import DeferredHostSync, Prefetcher, device_put_batch
from .multimodal import MultiModalEpisodeSampler
from . import transforms

__all__ = [
    "SyntheticEpisodeSource", "SplitIndex", "VideoRecord", "load_split_lists",
    "VideoStore", "ZipFrameStore", "scan_frame_tree", "sample_frame_indices",
    "load_clip", "FeatureStore", "MultiModalFeatureStore", "scan_feature_tree",
    "EpisodeSampler", "EpisodeSpec", "EpisodeMeta", "draw_episode_spec",
    "save_fixed_episodes", "load_fixed_episodes",
    "load_reference_fixed_episodes", "save_reference_fixed_episodes",
    "Prefetcher", "DeferredHostSync",
    "device_put_batch", "MultiModalEpisodeSampler", "transforms",
]
