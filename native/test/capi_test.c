/*
 * C API smoke test: callback-to-callback voxelization of a unit cube,
 * checking the closed-form voxel count -- the same fixture the reference's
 * test suite uses (reference test/main.cpp:120-156).
 *
 * Run with OBJ2VOXEL_TPU_PATH=<repo root> so the embedded interpreter finds
 * the package.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../include/obj2voxel.h"

static const float CUBE_VERTS[8][3] = {
    {0, 0, 0}, {0, 0, 1}, {0, 1, 0}, {0, 1, 1},
    {1, 0, 0}, {1, 0, 1}, {1, 1, 0}, {1, 1, 1},
};

static const int CUBE_QUADS[6][4] = {
    {0, 1, 3, 2}, {4, 6, 7, 5}, {0, 4, 5, 1},
    {2, 3, 7, 6}, {0, 2, 6, 4}, {1, 5, 7, 3},
};

typedef struct {
    int tri_index; /* 0..11: two triangles per quad */
} input_state;

static bool input_cb(void *data, obj2voxel_triangle *out) {
    input_state *st = (input_state *)data;
    if (st->tri_index >= 12) return false;
    int quad = st->tri_index / 2;
    int half = st->tri_index % 2;
    const int *q = CUBE_QUADS[quad];
    int idx[3];
    if (half == 0) {
        idx[0] = q[0]; idx[1] = q[1]; idx[2] = q[2];
    } else {
        idx[0] = q[0]; idx[1] = q[2]; idx[2] = q[3];
    }
    float verts[9];
    for (int i = 0; i < 3; ++i)
        memcpy(verts + 3 * i, CUBE_VERTS[idx[i]], 3 * sizeof(float));
    obj2voxel_set_triangle_basic(out, verts);
    st->tri_index += 1;
    return true;
}

typedef struct {
    size_t voxel_count;
} output_state;

static bool output_cb(void *data, uint32_t *voxels, size_t count) {
    output_state *st = (output_state *)data;
    (void)voxels;
    st->voxel_count += count;
    return true;
}

int main(void) {
    const uint32_t resolution = 32;
    const size_t expected =
        8 + 12 * (resolution - 2) + 6 * (size_t)(resolution - 2) * (resolution - 2);

    obj2voxel_instance *inst = obj2voxel_alloc();
    if (!inst) {
        fprintf(stderr, "obj2voxel_alloc failed\n");
        return 1;
    }

    input_state in = {0};
    output_state out = {0};
    obj2voxel_set_input_callback(inst, input_cb, &in);
    obj2voxel_set_output_callback(inst, output_cb, &out);
    obj2voxel_set_resolution(inst, resolution);

    obj2voxel_error_t err = obj2voxel_voxelize(inst);
    if (err != OBJ2VOXEL_ERR_OK) {
        fprintf(stderr, "voxelize failed: %d\n", (int)err);
        return 1;
    }
    obj2voxel_free(inst);

    printf("voxels: %zu expected: %zu\n", out.voxel_count, expected);
    if (out.voxel_count != expected) {
        fprintf(stderr, "FAIL: voxel count mismatch\n");
        return 1;
    }

    /* error-path check: double voxelization on a fresh instance */
    obj2voxel_instance *inst2 = obj2voxel_alloc();
    obj2voxel_error_t e = obj2voxel_voxelize(inst2);
    if (e != OBJ2VOXEL_ERR_NO_INPUT) {
        fprintf(stderr, "FAIL: expected ERR_NO_INPUT, got %d\n", (int)e);
        return 1;
    }
    obj2voxel_free(inst2);

    printf("C API smoke test PASSED\n");
    return 0;
}
