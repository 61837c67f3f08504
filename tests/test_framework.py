"""Framework layer tests.

Coverage model: the reference's own framework tests
(framework/config_test.py, register_test.py, module_test.py) — tagged-union
validation, tag enforcement at class-definition time, registry lifecycle,
nested config composition.
"""

import json
from typing import Annotated, List, Literal, Union

import pytest
from pydantic import Field, ValidationError

from rag_arc_tpu.framework import AbstractConfig, AbstractModule, Register


class EngineA(AbstractModule):
    pass


class EngineB(AbstractModule):
    pass


class ConfigA(AbstractConfig):
    type: Literal["A"] = "A"
    size: int = 1

    def target(self):
        return EngineA


class ConfigB(AbstractConfig):
    type: Literal["B"] = "B"
    name: str = "b"

    def target(self):
        return EngineB


AnySub = Annotated[Union[ConfigA, ConfigB], Field(discriminator="type")]


class Composite(AbstractModule):
    pass


class CompositeConfig(AbstractConfig):
    type: Literal["COMPOSITE"] = "COMPOSITE"
    inner: AnySub
    extras: List[AnySub] = []

    def target(self):
        return Composite


class TestConfigSystem:
    def test_tag_required_at_class_definition(self):
        with pytest.raises(TypeError, match="type"):

            class Bad(AbstractConfig):  # noqa: F841 — missing type tag
                x: int = 0

    def test_tag_must_be_single_literal(self):
        with pytest.raises(TypeError):

            class Bad(AbstractConfig):  # noqa: F841
                type: Literal["X", "Y"] = "X"

    def test_tag_default_must_match(self):
        with pytest.raises(TypeError):

            class Bad(AbstractConfig):  # noqa: F841
                type: Literal["X"] = "Y"  # type: ignore[assignment]

    def test_abstract_intermediate_allowed(self):
        class Base(AbstractConfig):
            abstract = True
            common: int = 0

        class Leaf(Base):
            type: Literal["LEAF"] = "LEAF"

        assert Leaf().tag == "LEAF"
        assert Leaf(common=3).common == 3

    def test_discriminated_union_dispatch(self):
        cfg = CompositeConfig.model_validate(
            {"type": "COMPOSITE", "inner": {"type": "B", "name": "x"}}
        )
        assert isinstance(cfg.inner, ConfigB)
        assert cfg.inner.name == "x"

    def test_wrong_tag_rejected(self):
        with pytest.raises(ValidationError):
            ConfigA.model_validate({"type": "B"})

    def test_union_list(self):
        cfg = CompositeConfig.model_validate(
            {
                "type": "COMPOSITE",
                "inner": {"type": "A"},
                "extras": [{"type": "A", "size": 2}, {"type": "B"}],
            }
        )
        assert isinstance(cfg.extras[0], ConfigA)
        assert isinstance(cfg.extras[1], ConfigB)

    def test_extra_fields_forbidden(self):
        with pytest.raises(ValidationError):
            ConfigA.model_validate({"type": "A", "bogus": 1})

    def test_build_passes_config(self):
        module = ConfigA(size=7).build()
        assert isinstance(module, EngineA)
        assert module.config.size == 7

    def test_nested_build(self):
        cfg = CompositeConfig(inner=ConfigA(size=5))
        module = cfg.build()
        assert isinstance(module, Composite)
        assert isinstance(module.config.inner, ConfigA)


class TestRegister:
    def test_singleton(self):
        assert Register() is Register()

    def test_register_from_file(self, tmp_path):
        p = tmp_path / "a.json"
        p.write_text(json.dumps({"type": "A", "size": 3}))
        inst = Register().register(p, "app_a", ConfigA)
        assert isinstance(inst, EngineA)
        assert Register().get_object("app_a") is inst
        assert Register().get_config("app_a").size == 3

    def test_register_invalid_json_returns_none(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text("{not json")
        assert Register().register(p, "bad", ConfigA) is None
        assert Register().get_object("bad") is None

    def test_register_missing_file_returns_none(self, tmp_path):
        assert Register().register(tmp_path / "nope.json", "x", ConfigA) is None

    def test_register_wrong_schema_returns_none(self, tmp_path):
        p = tmp_path / "wrong.json"
        p.write_text(json.dumps({"type": "B"}))
        assert Register().register(p, "x", ConfigA) is None

    def test_overwrite_and_multiple(self, tmp_path):
        r = Register()
        a = r.register_config(ConfigA(), "app")
        b = r.register_config(ConfigB(), "app")
        assert r.get_object("app") is b and a is not b
        r.register_config(ConfigA(), "other")
        assert r.list_apps() == ["app", "other"]

    def test_get_object_miss(self):
        assert Register().get_object("missing") is None
