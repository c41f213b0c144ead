from sculptmate_tpu.pipelines.generate import TripoGenerator, Fast3DGenerator  # noqa: F401
