// Stub assimp postprocess flags.
#ifndef AI_POSTPROCESS_H_INC
#define AI_POSTPROCESS_H_INC

enum aiPostProcessSteps {
    aiProcess_CalcTangentSpace = 0x1,
    aiProcess_Triangulate = 0x8,
    aiProcess_JoinIdenticalVertices = 0x2,
    aiProcess_GenNormals = 0x20,
    aiProcess_GenSmoothNormals = 0x40,
    aiProcess_PreTransformVertices = 0x100,
    aiProcess_FlipUVs = 0x800000,
};

#endif
