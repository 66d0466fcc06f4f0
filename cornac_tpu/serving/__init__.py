"""Model serving (Flask app). Run with:
``MODEL_PATH=... MODEL_CLASS=... flask --app cornac_tpu.serving.app run``
"""
