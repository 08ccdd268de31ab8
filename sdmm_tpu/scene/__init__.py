from .scene import SceneBuilder, SceneData
