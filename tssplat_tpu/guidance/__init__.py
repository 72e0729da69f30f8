from .sds import (SDSConfig, TargetImageGuidance, DiffusersGuidance,
                  sds_image_grad, load_guidance)

__all__ = ["SDSConfig", "TargetImageGuidance", "DiffusersGuidance",
           "sds_image_grad", "load_guidance"]
