"""Config system tests: python-file loading, _base_ inheritance, overrides."""

import textwrap

from dynamask_tpu.utils import Config, Registry


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_flat_config(tmp_path):
    f = _write(tmp_path, 'cfg.py', '''
        model = dict(type='MaskRCNN', backbone=dict(type='ResNet', depth=50))
        total_epochs = 12
        lr = 0.02
    ''')
    cfg = Config.fromfile(f)
    assert cfg.model.type == 'MaskRCNN'
    assert cfg.model.backbone.depth == 50
    assert cfg.total_epochs == 12


def test_base_inheritance(tmp_path):
    _write(tmp_path, 'base.py', '''
        model = dict(type='MaskRCNN', backbone=dict(type='ResNet', depth=50),
                     neck=dict(type='FPN'))
        optimizer = dict(type='SGD', lr=0.02)
    ''')
    f = _write(tmp_path, 'child.py', '''
        _base_ = ['./base.py']
        model = dict(backbone=dict(depth=101))
        optimizer = dict(lr=0.01)
    ''')
    cfg = Config.fromfile(f)
    assert cfg.model.type == 'MaskRCNN'          # inherited
    assert cfg.model.backbone.depth == 101       # overridden
    assert cfg.model.backbone.type == 'ResNet'   # merged
    assert cfg.model.neck.type == 'FPN'
    assert cfg.optimizer.lr == 0.01


def test_delete_key(tmp_path):
    _write(tmp_path, 'base.py', "head = dict(type='A', a=1, b=2)\n")
    f = _write(tmp_path, 'child.py',
               "_base_ = ['./base.py']\nhead = dict(_delete_=True, type='B')\n")
    cfg = Config.fromfile(f)
    assert cfg.head == {'type': 'B'}


def test_merge_from_options(tmp_path):
    f = _write(tmp_path, 'cfg.py', "model = dict(backbone=dict(depth=50))\n")
    cfg = Config.fromfile(f)
    cfg.merge_from_options({'model.backbone.depth': '101',
                            'data.samples_per_gpu': '4',
                            'work_dir': 'out'})
    assert cfg.model.backbone.depth == 101
    assert cfg.data.samples_per_gpu == 4
    assert cfg.work_dir == 'out'


def test_registry_build():
    reg = Registry('thing')

    @reg.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = reg.build(dict(type='Foo', a=1))
    assert (obj.a, obj.b) == (1, 2)
    obj = reg.build(dict(type='Foo', a=1), b=5)
    assert obj.b == 5


def test_registry_rejects_unknown():
    reg = Registry('x')
    try:
        reg.build(dict(type='Nope'))
        raised = False
    except KeyError:
        raised = True
    assert raised
