from .pipeline import RenderOutput, render_views, MeshRasterizer

__all__ = ["RenderOutput", "render_views", "MeshRasterizer"]
