from .mesh import sample_mesh, sample_model_mesh, SAMPLE_AXIS, MODEL_AXIS
