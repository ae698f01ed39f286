// Minimal assimp API stub — just enough surface for the reference's
// node_constructor.cpp / API.cpp to compile. ReadFile always fails, so
// load3DModel() reports "Failed to load"; the parity scenes build their
// geometry with createMesh/createVertex in the DSL instead (the bundled
// model assets are not part of the reference repository anyway).
#ifndef AI_SCENE_H_INC
#define AI_SCENE_H_INC

#include <cstring>
#include <string>

struct aiString {
    char data[1024];
    aiString() { data[0] = 0; }
    const char* C_Str() const { return data; }
};

enum aiReturn { aiReturn_SUCCESS = 0, aiReturn_FAILURE = -1 };

enum aiTextureType {
    aiTextureType_NONE = 0,
    aiTextureType_DIFFUSE = 1,
    aiTextureType_SPECULAR = 2,
    aiTextureType_AMBIENT = 3,
    aiTextureType_EMISSIVE = 4,
    aiTextureType_HEIGHT = 5,
    aiTextureType_NORMALS = 6,
    aiTextureType_SHININESS = 7,
    aiTextureType_OPACITY = 8,
    aiTextureType_DISPLACEMENT = 9,
};

#define AI_MATKEY_NAME "?mat.name", 0, 0
#define AI_MATKEY_COLOR_DIFFUSE "$clr.diffuse", 0, 0
#define AI_MATKEY_COLOR_SPECULAR "$clr.specular", 0, 0
#define AI_MATKEY_COLOR_EMISSIVE "$clr.emissive", 0, 0
#define AI_MATKEY_TEXTURE(type, N) "$tex.file", type, N
#define AI_MATKEY_TEXTURE_DIFFUSE(N) AI_MATKEY_TEXTURE(aiTextureType_DIFFUSE, N)
#define AI_MATKEY_TEXTURE_SPECULAR(N) AI_MATKEY_TEXTURE(aiTextureType_SPECULAR, N)
#define AI_MATKEY_TEXTURE_EMISSIVE(N) AI_MATKEY_TEXTURE(aiTextureType_EMISSIVE, N)
#define AI_MATKEY_TEXTURE_HEIGHT(N) AI_MATKEY_TEXTURE(aiTextureType_HEIGHT, N)
#define AI_MATKEY_TEXTURE_NORMALS(N) AI_MATKEY_TEXTURE(aiTextureType_NORMALS, N)
#define AI_MATKEY_TEXTURE_OPACITY(N) AI_MATKEY_TEXTURE(aiTextureType_OPACITY, N)
#define AI_MATKEY_TEXTURE_DISPLACEMENT(N) AI_MATKEY_TEXTURE(aiTextureType_DISPLACEMENT, N)

struct aiVector3D {
    float x, y, z;
    aiVector3D() : x(0), y(0), z(0) {}
    aiVector3D(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
};

struct aiColor3D {
    float r, g, b;
};

struct aiMatrix4x4 {
    float a1, a2, a3, a4;
    float b1, b2, b3, b4;
    float c1, c2, c3, c4;
    float d1, d2, d3, d4;
    aiMatrix4x4()
        : a1(1), a2(0), a3(0), a4(0), b1(0), b2(1), b3(0), b4(0),
          c1(0), c2(0), c3(1), c4(0), d1(0), d2(0), d3(0), d4(1) {}
};

struct aiMaterial {
    // The stub importer never produces materials; every Get fails.
    template <typename T>
    aiReturn Get(const char*, unsigned int, unsigned int, T&) const {
        return aiReturn_FAILURE;
    }
    aiReturn Get(const char*, unsigned int, unsigned int, float*,
                 unsigned int*) const {
        return aiReturn_FAILURE;
    }
    unsigned int GetTextureCount(aiTextureType) const { return 0; }
};

enum aiPrimitiveType {
    aiPrimitiveType_POINT = 0x1,
    aiPrimitiveType_LINE = 0x2,
    aiPrimitiveType_TRIANGLE = 0x4,
};

struct aiFace {
    unsigned int mNumIndices = 0;
    unsigned int* mIndices = nullptr;
};

struct aiMesh {
    unsigned int mPrimitiveTypes = 0;
    unsigned int mNumVertices = 0;
    unsigned int mNumFaces = 0;
    aiVector3D* mVertices = nullptr;
    aiVector3D* mNormals = nullptr;
    aiVector3D* mTangents = nullptr;
    aiVector3D* mTextureCoords[8] = {};
    unsigned int mNumUVComponents[8] = {};
    aiFace* mFaces = nullptr;
    unsigned int mMaterialIndex = 0;
    aiString mName;
};

struct aiNode {
    aiString mName;
    aiMatrix4x4 mTransformation;
    aiNode* mParent = nullptr;
    unsigned int mNumChildren = 0;
    aiNode** mChildren = nullptr;
    unsigned int mNumMeshes = 0;
    unsigned int* mMeshes = nullptr;
};

struct aiScene {
    unsigned int mFlags = 0;
    aiNode* mRootNode = nullptr;
    unsigned int mNumMeshes = 0;
    aiMesh** mMeshes = nullptr;
    unsigned int mNumMaterials = 0;
    aiMaterial** mMaterials = nullptr;
};

#endif
