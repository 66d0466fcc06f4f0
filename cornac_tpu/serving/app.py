"""Flask model-serving app (reference-compatible surface).

Capability parity with reference ``cornac/serving/app.py:41-294``:
``GET /recommend``, ``POST /feedback``, ``POST /evaluate`` with sandboxed
metric expressions; model loaded from ``MODEL_PATH``/``MODEL_CLASS``/
``TRAIN_SET`` env vars. Endpoint logic lives in
:mod:`cornac_tpu.serving.core` and is shared with the stdlib fallback
server (:mod:`cornac_tpu.serving.standalone`) for Flask-less environments.

Run: ``MODEL_PATH=... MODEL_CLASS=... flask --app cornac_tpu.serving.app run``
"""

from .core import (
    handle_evaluate,
    handle_feedback,
    handle_recommend,
    load_model,
)

try:
    from flask import Flask, jsonify, request
except ImportError:  # pragma: no cover
    raise SystemExit(
        "Flask is required in order to serve models.\nRun: pip3 install Flask\n"
        "(or use the dependency-free server: python -m cornac_tpu.serving.standalone)"
    )

model = None
train_set = None


def create_app():
    global model, train_set
    app = Flask(__name__)
    model, train_set = load_model(app.instance_path)
    return app


app = create_app()


def _respond(payload, status):
    if isinstance(payload, str):
        return payload, status
    return jsonify(payload), status


@app.route("/recommend", methods=["GET"])
def recommend():
    return _respond(*handle_recommend(model, train_set, request.args))


@app.route("/feedback", methods=["POST"])
def add_feedback():
    return _respond(*handle_feedback(request.args))


@app.route("/evaluate", methods=["POST"])
def evaluate():
    return _respond(*handle_evaluate(model, train_set, request.json))


if __name__ == "__main__":
    app.run()
