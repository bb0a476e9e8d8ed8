from .app import InferenceModel, create_app, get_model
from .cli import report
