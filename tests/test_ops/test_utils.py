import numpy as np

from pb_bss_tpu import utils


def test_abs_square():
    assert float(utils.abs_square(np.array(3 + 4j))) == 25.0
    assert float(utils.abs_square(np.array(3.0))) == 9.0


def test_unsqueeze():
    assert utils.unsqueeze(np.ones((2, 3)), (-3, -1)).shape == (2, 1, 3, 1)
    assert utils.unsqueeze(13, (-2, -1)).shape == (1, 1)


def test_is_broadcast_compatible():
    assert utils.is_broadcast_compatible((5, 1, 6), (5, 3, 6))
    assert not utils.is_broadcast_compatible((5, 2, 6), (5, 3, 6))
    assert utils.is_broadcast_compatible((1, 6), (5, 3, 6))


def test_labels_to_one_hot():
    out = utils.labels_to_one_hot([0, 1], categories=4)
    np.testing.assert_array_equal(
        out,
        [[True, False], [False, True], [False, False], [False, False]],
    )
    out = utils.labels_to_one_hot([0, 1], categories=4, axis=-1)
    assert out.shape == (2, 4)
    out = utils.labels_to_one_hot([[0, 1], [0, 3]], categories=4, axis=1)
    assert out.shape == (2, 4, 2)
    assert out[1, 3, 1]
    out = utils.labels_to_one_hot(
        np.array([[0], [1]]), categories=3, axis=1, keepdims=True)
    assert out.shape == (2, 3)


def test_stft_center_frequencies():
    np.testing.assert_allclose(
        utils.get_stft_center_frequencies(4, 16000), [0., 4000., 8000.])


def test_reshape():
    assert utils.reshape(np.zeros((2, 3, 4)), 'f t d -> d (f t)').shape == (4, 6)
    assert utils.reshape(np.zeros((2, 3, 4)), 'f t d -> d t f').shape == (4, 3, 2)
    assert utils.reshape(np.zeros((2, 3, 4)), 'f t d -> d f*t').shape == (4, 6)
    assert utils.reshape(np.zeros((1, 3, 4)), '1 t d -> d t').shape == (4, 3)
