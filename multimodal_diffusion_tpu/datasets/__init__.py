from .av_manifest import AVClipsDataset, AVManifestDataset  # noqa: F401
from .collate import collate_batch  # noqa: F401
from .loader import DataLoader  # noqa: F401
