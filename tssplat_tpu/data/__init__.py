from .datasets import (MitsubaImgDataset, BlenderImgDataset,
                       Wonder3DImgDataset, ArrayDataset)
from .loader import (ViewDataLoader, MitsubaImgDataLoader,
                     BlenderImgDataLoader, Wonder3DDataLoader,
                     ArrayDataLoader)

__all__ = [
    "MitsubaImgDataset", "BlenderImgDataset", "Wonder3DImgDataset",
    "ArrayDataset", "ViewDataLoader", "MitsubaImgDataLoader",
    "BlenderImgDataLoader", "Wonder3DDataLoader", "ArrayDataLoader",
]
